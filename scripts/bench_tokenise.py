"""Tokenisation throughput bench: the fused mHuBERT-25Hz + k-means-500 jit
(random weights — identical FLOPs to the real checkpoint) over 16x30s batches.
Measured on v5e: ~2,750 audio-hours/hour/chip.

Run on the TPU: python scripts/bench_tokenise.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "--help" in sys.argv or "-h" in sys.argv:
    print(__doc__); sys.exit(0)
import numpy as np, jax, jax.numpy as jnp
from slamkit_tpu.feature_extractor.hubert_jax import HubertConfig, forward
from slamkit_tpu.feature_extractor.kmeans import assign_clusters

# mhubert-25hz arch (8 convs, stride 640), random weights = identical FLOPs
cfg = HubertConfig(conv_dim=(512,)*8, conv_kernel=(10,3,3,3,3,2,2,2),
                   conv_stride=(5,2,2,2,2,2,2,2))
rng = np.random.default_rng(0)
def normal(*s): return rng.standard_normal(s).astype(np.float32) * 0.02
params = {
  "conv_layers": [dict(conv_w=normal(512, 1 if i==0 else 512, k),
                       **({"norm_scale": np.ones(512,np.float32), "norm_bias": np.zeros(512,np.float32)} if i==0 else {}))
                  for i,k in enumerate(cfg.conv_kernel)],
  "fp_norm_scale": np.ones(512,np.float32), "fp_norm_bias": np.zeros(512,np.float32),
  "fp_proj_w": normal(768,512), "fp_proj_b": np.zeros(768,np.float32),
  "pos_conv_w": normal(768,48,128), "pos_conv_b": np.zeros(768,np.float32),
  "enc_norm_scale": np.ones(768,np.float32), "enc_norm_bias": np.zeros(768,np.float32),
  "layers": {k: v for k,v in {
    "q_w": normal(12,768,768), "q_b": np.zeros((12,768),np.float32),
    "k_w": normal(12,768,768), "k_b": np.zeros((12,768),np.float32),
    "v_w": normal(12,768,768), "v_b": np.zeros((12,768),np.float32),
    "o_w": normal(12,768,768), "o_b": np.zeros((12,768),np.float32),
    "ln1_scale": np.ones((12,768),np.float32), "ln1_bias": np.zeros((12,768),np.float32),
    "ff_in_w": normal(12,3072,768), "ff_in_b": np.zeros((12,3072),np.float32),
    "ff_out_w": normal(12,768,3072), "ff_out_b": np.zeros((12,768),np.float32),
    "ln2_scale": np.ones((12,768),np.float32), "ln2_bias": np.zeros((12,768),np.float32)}.items()},
}
params = jax.device_put(params)
centroids = jax.device_put(rng.standard_normal((500,768)).astype(np.float32))

@jax.jit
def extract(params, centroids, wav):
    h = forward(params, cfg, jnp.pad(wav, ((0,0),(40,40))), tap_layer=11)
    return assign_clusters(h, centroids)

B, SECONDS = 16, 30
wav = jnp.asarray(rng.standard_normal((B, SECONDS*16000)).astype(np.float32))
u = extract(params, centroids, wav); np.asarray(u[0,0])
u = extract(params, centroids, wav); np.asarray(u[0,0])
n = 10
t0 = time.perf_counter()
for _ in range(n):
    u = extract(params, centroids, wav)
np.asarray(u[0,0])
dt = time.perf_counter() - t0
audio_sec = n * B * SECONDS
print(f"tokenisation: {audio_sec/dt:,.0f}x realtime = {audio_sec/dt*3600/3600:,.0f} audio-hours/hour/chip ({dt/n*1e3:.0f}ms per {B}x{SECONDS}s batch)")
