"""Small unit tests for helpers added late in round 1."""
import os

import numpy as np
import pytest


def test_default_flash_block_sizes():
    from slamkit_tpu.ops.flash_attention import default_block_sizes

    # (bq_fwd, bk, bq_bwd, bk): fwd holds 2 live score panels, bwd ~3 —
    # measured VMEM budgets, G folds into the panel height
    assert default_block_sizes(1024, 1024) == (1024, 1024, 1024, 1024)
    assert default_block_sizes(128, 128) == (128, 128, 128, 128)
    # VMEM caps: G*bq*bk*4B*panels <= budget
    bq, bk, bqb, bkb = default_block_sizes(8192, 8192)
    assert bq * bk * 4 * 2 <= 8 * 1024 * 1024
    assert bqb * bkb * 4 * 3 <= 12 * 1024 * 1024
    assert bq % 128 == 0 and bk % 128 == 0
    # GQA folding shrinks the q block, fwd floor 128 / bwd floor 64
    bq, bk, bqb, _ = default_block_sizes(1024, 1024, groups=7)
    assert 7 * bq * bk * 4 * 2 <= 8 * 1024 * 1024 or bq == 128
    assert bq == 128 and bqb == 128
    # non-multiples round up to lanes
    bq, bk, _, _ = default_block_sizes(200, 333)
    assert bq == 256 and bk == 384


def test_flash_block_validation():
    import jax.numpy as jnp

    from slamkit_tpu.ops import flash_attention

    q = jnp.zeros((1, 1, 128, 64), jnp.float32)
    # block_q only needs sublane alignment (8) since GQA folding; block_k
    # tiles the lane dim and must stay a multiple of 128
    with pytest.raises(ValueError, match="multiple of 128"):
        flash_attention(q, q, q, block_q=128, block_k=64, interpret=True)
    with pytest.raises(ValueError, match="multiple of 8"):
        flash_attention(q, q, q, block_q=12, block_k=128, interpret=True)


def test_resolve_reference_path_precedence(monkeypatch):
    from slamkit_tpu.utils.path_utils import resolve_reference_path

    monkeypatch.setenv("SLAM_REFERENCE_PATH", "/env")
    assert resolve_reference_path("//reference/d", "/cfg") == "/env/d"
    monkeypatch.delenv("SLAM_REFERENCE_PATH")
    assert resolve_reference_path("//reference/d", "/cfg") == "/cfg/d"
    assert resolve_reference_path("/plain/path", "/cfg") == "/plain/path"
    with pytest.raises(ValueError):
        resolve_reference_path("//reference/d", None)


def test_checkpoint_manager_registry():
    from slamkit_tpu.vocoder.checkpoint_manager import CHECKPOINT_MANAGER, CHECKPOINTS

    assert len(CHECKPOINTS) == 50
    # the names the reference's vocoder configs construct resolve
    for name in ("mhubert-base-25hz-kmeans-500-hifigan",
                 "mhubert-base-25hz-kmeans-500-hifigan-config",
                 "hubert-base-ls960-layer-9-kmeans-500-hifigan-speakers",
                 "cpc-big-ll6k-kmeans-100", "waveglow"):
        assert name in CHECKPOINT_MANAGER.storage
    with pytest.raises(FileNotFoundError):
        CHECKPOINT_MANAGER.get_by_name("waveglow", download_if_needed=False)
    with pytest.raises(KeyError):
        CHECKPOINT_MANAGER.get_by_name("no-such-checkpoint")


def test_hifigan_vocoder_meta_resolution(tmp_path):
    from slamkit_tpu.vocoder.hifi_gan_vocoder import HiFiGANVocoder

    voc = HiFiGANVocoder.__new__(HiFiGANVocoder)
    voc.speakers = ["ex01", "ex04"]
    voc.styles = None
    assert voc._resolve("ex04", voc.speakers, "speaker") == 1
    assert voc._resolve(3, voc.speakers, "speaker") == 3
    with pytest.raises(ValueError, match="no style metadata"):
        voc._resolve("happy", voc.styles, "style")


def test_spoken_datasets_write_distinct_files(tmp_path, monkeypatch):
    # metadata filenames must not collide between swag and hellaswag
    import slamkit_tpu.utils.data_prep as dp

    written = []
    monkeypatch.setattr(dp, "_synthesise_split",
                        lambda ds, sp, out, name: written.append(name))

    class FakeDS(list):
        def filter(self, fn):
            return self

        def map(self, fn):
            return self

        def remove_columns(self, cols):
            return self

        def select(self, r):
            return self

    import sys, types
    fake = types.ModuleType("datasets")
    fake.load_dataset = lambda *a, **k: FakeDS()
    monkeypatch.setitem(sys.modules, "datasets", fake)
    dp.create_spoken_swag("x", str(tmp_path))
    dp.create_spoken_hellaswag("x", str(tmp_path))
    assert written == ["spoken_swag_validation.jsonl",
                       "spoken_hellaswag_validation.jsonl"]


def test_tts_alignment_pure_function():
    """attention_to_word_times reproduces the reference's equality-match walk
    (reference tts_utils.py:60-78) from a per-frame phoneme-index track."""
    import numpy as np
    from slamkit_tpu.utils.tts_utils import (attention_to_word_times,
                                             clean_phonemes)

    # BOS on frames 0-1, then tokens 1..5 over contiguous frame runs
    track = np.array([0, 0, 1, 1, 1, 2, 2, 3, 3, 3, 4, 4, 5, 5, 5])
    spans = attention_to_word_times(track, [2, 3], ["hi", "there"], 16000)
    assert spans == [(" hi", round(2 * 256 / 16000, 3), round(6 * 256 / 16000, 3)),
                     (" there", round(7 * 256 / 16000, 3), round(14 * 256 / 16000, 3))]

    # equivalence against a direct transcription of the reference walk, on a
    # random monotone track
    import torch
    rng = np.random.default_rng(0)
    counts = [3, 1, 4]
    n_tok = 1 + sum(counts)
    track = np.repeat(np.arange(n_tok), rng.integers(1, 5, n_tok))
    attn = torch.tensor(track)
    ref, cur = [], 1
    for w, c in zip(["a", "b", "c"], counts):
        idx = (torch.tensor((cur, cur + c - 1), dtype=torch.float32).unsqueeze(1)
               == attn).nonzero(as_tuple=True)[1]
        ref.append((" " + w, round(idx[0].item() * 256 / 22050, 3),
                    round(idx[-1].item() * 256 / 22050, 3)))
        cur += c
    assert attention_to_word_times(track, counts, ["a", "b", "c"], 22050) == ref

    assert clean_phonemes(["HH", "AY1", ",", ";", "!", "sp"]) == \
        ["HH", "AY1", "sp", "sp", "sp"]

    with pytest.raises(ValueError, match="no frame attends"):
        attention_to_word_times(np.array([0, 9]), [1], ["x"], 16000)

    # a zero-duration LAST phoneme (no frame attends to token 2) degrades to
    # the first phoneme's span instead of aborting — the reference's combined
    # equality match returns idx over whichever end has frames
    track = np.array([0, 1, 1, 3])
    spans = attention_to_word_times(track, [2, 1], ["ab", "c"], 16000)
    assert spans[0] == (" ab", round(1 * 256 / 16000, 3),
                        round(2 * 256 / 16000, 3))


def test_tts_generate_wav_with_faked_fairseq(monkeypatch):
    """generate_wav alignment path end-to-end with a faked fairseq output and
    g2p: phoneme cleaning + attention walk, no fairseq install needed."""
    import numpy as np
    import torch
    from slamkit_tpu.utils import tts_utils

    fs2 = tts_utils.FastSpeech2.__new__(tts_utils.FastSpeech2)
    fs2.sr = 22050
    fs2.g2p = lambda w: {"hey": ["HH", "EY1", "!"], "you": ["Y", "UW1"]}[w]
    track = np.array([0, 1, 1, 2, 2, 2, 3, 4, 4])
    fake_out = [{"attn": torch.tensor(track), "wav": torch.zeros(9 * 256)}]
    monkeypatch.setattr(tts_utils.FastSpeech2, "_synthesize",
                        lambda self, text: fake_out)

    out = fs2.generate_wav("hey you", alignment=False)
    assert out is fake_out
    out, spans = fs2.generate_wav("hey you", alignment=True)
    # "hey" -> 2 cleaned phonemes ("!" dropped): tokens 1..2, frames 1..5
    # "you" -> tokens 3..4, frames 6..8
    assert spans == [(" hey", round(1 * 256 / 22050, 3), round(5 * 256 / 22050, 3)),
                     (" you", round(6 * 256 / 22050, 3), round(8 * 256 / 22050, 3))]
