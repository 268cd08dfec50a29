"""Recorded-activation gate for the JAX HuBERT encoder (VERDICT.md item 5).

tests/fixtures/hubert_parity.npz carries a seeded tiny HF HubertModel's
weights, an input wav, and the torch hidden states at the tap layers —
recorded once by scripts/make_hubert_fixture.py. This test reconstructs the
JAX encoder from the recorded weights and compares activations WITHOUT
torch/transformers or network access, so encoder numerics are pinned even
where HF can't run. Rerun the script with --model <real mhubert dir> to
record real-weight slices for the stage-1 bit-parity proof."""
import json
import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from slamkit_tpu.feature_extractor.hubert_jax import (HubertConfig,
                                                      convert_hf_state_dict,
                                                      forward)

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "hubert_parity.npz"


@pytest.fixture(scope="module")
def fixture():
    assert FIXTURE.is_file(), "run scripts/make_hubert_fixture.py"
    return np.load(FIXTURE)


def test_recorded_activation_parity(fixture):
    cfg_dict = json.loads(bytes(fixture["config_json"]).decode())
    cfg = HubertConfig.from_hf_dict(cfg_dict)
    sd = {k[len("sd::"):]: fixture[k] for k in fixture.files
          if k.startswith("sd::")}
    assert sd, "fixture carries no weights (recorded from a real model?)"
    params = convert_hf_state_dict(sd, cfg)
    wav = jnp.asarray(fixture["wav"])[None]
    for key in fixture.files:
        if not key.startswith("hidden_"):
            continue
        layer = int(key.split("_")[1])
        ours = np.asarray(forward(params, cfg, wav, tap_layer=layer))
        ref = fixture[key]
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3,
                                   err_msg=f"layer {layer}")


def _load_fixture_script():
    import importlib.util

    path = pathlib.Path(__file__).parent.parent / "scripts" / \
        "make_hubert_fixture.py"
    spec = importlib.util.spec_from_file_location("make_hubert_fixture", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_full_size_extract_parity(fixture, tmp_path):
    """Full-size gate (VERDICT r3 item 2a): a fabricated hubert-base at TRUE
    shapes (12 layers, 768 dim, 512-wide group-norm conv stack) over the REAL
    example_data audio, recorded once through the torch reference semantics
    (reference hubert_feature_extractor.py:40-48) by make_hubert_fixture.py
    --full-size. Re-fabricates the weights from the recipe, drives the actual
    HubertFeatureExtractor.extract path (pad-40, layer tap, relative trim,
    k-means argmin), and demands EXACT unit-id equality — pinning conv-length,
    trim, and argmin semantics at real scale without network access."""
    if "full::tap_layer" not in fixture.files:
        pytest.skip("fixture lacks the full-size recording (rerun the script "
                    "with --full-size)")
    transformers = pytest.importorskip("transformers")
    mk = _load_fixture_script()

    model = transformers.HubertModel(transformers.HubertConfig(**mk.FULL))
    model.load_state_dict(mk.fabricate_state_dict(model))
    model.save_pretrained(tmp_path / "model")
    np.save(tmp_path / "km.npy", mk.fabricate_kmeans(mk.FULL["hidden_size"]))

    from slamkit_tpu.feature_extractor.hubert_feature_extractor import \
        HubertFeatureExtractor
    from slamkit_tpu.utils.audio import load_audio

    fe = HubertFeatureExtractor(pretrained_model=str(tmp_path / "model"),
                                kmeans_path=str(tmp_path / "km.npy"),
                                layer=int(fixture["full::tap_layer"]),
                                num_units=mk.N_KMEANS)

    names = bytes(fixture["full::names"]).decode().split("\n")
    audio_dir = pathlib.Path("/root/reference/example_data/audio")
    wavs = [np.asarray(load_audio(str(audio_dir / n), 16000), np.float32)
            for n in names]
    lens = np.array([len(w) for w in wavs])
    np.testing.assert_array_equal(lens, fixture["full::lens"])
    batch = np.zeros((len(wavs), int(lens.max())), np.float32)
    for i, w in enumerate(wavs):
        batch[i, :len(w)] = w

    # activation gate at the tap — recording is f16, so tolerance is its
    # quantization step (measured max err 9.8e-4 vs activation scale ~3.0)
    hid = np.asarray(forward(
        fe.params, fe.config,
        jnp.pad(jnp.asarray(batch), ((0, 0), (40, 40))),
        tap_layer=fe.layer))
    np.testing.assert_allclose(hid, fixture["full::hidden_f16"].astype(
        np.float32), atol=3e-3, rtol=0)

    units = fe.extract(batch, lens=lens)
    for i in range(len(names)):
        np.testing.assert_array_equal(
            np.asarray(units[i]), fixture[f"full::units_{i}"],
            err_msg=f"unit ids diverge for {names[i]}")
