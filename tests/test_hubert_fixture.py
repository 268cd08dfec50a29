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
