"""slamkit_tpu — a TPU-native (JAX/XLA/Pallas) framework for training and evaluating
Speech Language Models over discrete speech units.

Re-implements the capabilities of slp-rl/slamkit (the "Slamming" / "SIMS" toolkits)
with a TPU-first architecture: SPMD training over `jax.sharding.Mesh`, Pallas flash
attention with sequence-packing segment ids, fused HuBERT+k-means feature extraction,
and functional JAX models throughout.

Four-stage pipeline (stage boundaries are jsonl files, matching the reference formats
at /root/reference — see cli/extract_features.py:91-97, cli/prepare_tokens.py:26-32):

    1. extract_features : audio  -> {"units": [...], "duration": [...], "file_name": ...}
    2. prepare_tokens   : units  -> {"file_name": ..., "audio_repr": "<Un3><Un49>..."}
    3. train            : tokens -> checkpoint (orbax + HF-compatible export)
    4. eval             : checkpoint -> metrics (sWUGGY/sBLIMP/StoryCloze/SALMon/GenPPL/...)
"""

__version__ = "0.1.0"
