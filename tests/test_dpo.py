"""DPO tests: tokenize_row byte semantics, repetition filter, a 10-step DPO
run that must raise the chosen-vs-rejected margin (SURVEY.md §4)."""
import json
import pathlib

import numpy as np
import pytest

from slamkit_tpu.config import compose
from slamkit_tpu.data.preference import (get_repetition_filter_fn,
                                         init_preference_optimization_dataset)
from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig
from slamkit_tpu.tokeniser.unit_tokeniser import UnitTokeniser
from slamkit_tpu.trainer.slam_dpo_trainer import SLAMDPOTrainer, tokenize_row

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


def unit_str(ids):
    return "".join(f"<Un{i}>" for i in ids)


def test_tokenize_row_semantics():
    tok = UnitTokeniser(load_fe=False, num_units=500)
    features = {"prompt": unit_str([1, 2, 3]), "chosen": unit_str([4, 5]),
                "rejected": unit_str([6])}
    row = tokenize_row(features, tok, max_prompt_length=None,
                       max_completion_length=None, add_special_tokens=False)
    off = tok.offset
    # prompt = [bos] + ids (no eos); completions get a trailing eos
    assert row["prompt_input_ids"] == [tok.bos_token_id, 1 + off, 2 + off, 3 + off]
    assert row["chosen_input_ids"] == [4 + off, 5 + off, tok.eos_token_id]
    assert row["rejected_input_ids"] == [6 + off, tok.eos_token_id]
    # prompt truncates from the LEFT, completions from the right
    row2 = tokenize_row(features, tok, max_prompt_length=2,
                        max_completion_length=1, add_special_tokens=False)
    assert row2["prompt_input_ids"] == [2 + off, 3 + off]
    assert row2["chosen_input_ids"] == [4 + off]


def test_repetition_filter():
    fn = get_repetition_filter_fn(2, 0.3)
    assert not fn({"prompt_text": "a b a b", "chosen_text": "a b a b a b"})
    assert fn({"prompt_text": "one two three", "chosen_text": "four five six"})


def test_init_preference_dataset(tmp_path):
    rows = [
        {"prompt": {"audio_repr": unit_str([1])}, "chosen": {"audio_repr": unit_str([2])},
         "rejected": {"audio_repr": unit_str([3])},
         "prompt_text": "hello world now", "chosen_text": "fine day here", "extra": 1},
        {"prompt": {"audio_repr": unit_str([1])}, "chosen": {"audio_repr": unit_str([2])},
         "rejected": {"audio_repr": unit_str([3])},
         "prompt_text": "a b a b", "chosen_text": "a b a b a b", "extra": 2},
    ]
    with open(tmp_path / "p.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cfg = compose(str(REPO_ROOT / "config"), "preference_alignment_train", [
        f"data.train_path={tmp_path}/p.jsonl", f"data.val_path={tmp_path}/p.jsonl",
    ]).data
    ds = init_preference_optimization_dataset(cfg)
    assert len(ds["train"]) == 1  # repetition-filtered
    assert set(ds["train"][0]) == {"prompt", "chosen", "rejected"}


def test_dpo_training_improves_margin(tmp_path):
    tok = UnitTokeniser(load_fe=False, num_units=60)
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(32):
        p = unit_str(rng.integers(0, 60, 5))
        rows.append({"prompt": p,
                     "chosen": unit_str([7, 8, 9, 7, 8, 9]),
                     "rejected": unit_str(rng.integers(20, 60, 6))})
    model = UnitLM(UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                                vocab_size=62 + tok.offset, twist_init=False))
    args = compose(str(REPO_ROOT / "config"), "preference_alignment_train", [
        "data.train_path=/dev/null", "data.val_path=/dev/null",
        f"training_args.output_dir={tmp_path}/dpo",
        "training_args.per_device_train_batch_size=1",
        "training_args.max_steps=10", "training_args.logging_steps=1",
        "training_args.learning_rate=5e-4",
    ]).training_args
    tr = SLAMDPOTrainer(model, tok, args, rows, eval_dataset=rows[:8])
    state = tr.train()
    margins = [r["rewards/margins"] for r in state.log_history if "rewards/margins" in r]
    assert len(margins) == 10
    assert margins[0] == pytest.approx(0.0, abs=1e-4)  # policy == ref at step 1... margin grows after
    assert margins[-1] > margins[0]
    accs = [r for r in state.log_history if "eval_rewards/accuracies" in r]
    assert accs and accs[-1]["eval_rewards/accuracies"] >= 0.5
    assert (tmp_path / "dpo" / "checkpoint-10").is_dir()


def test_dpo_fsdp_train_and_collective_save(tmp_path):
    """DPO under fsdp (ZeRO-3) on the 8-device mesh: the step runs, params
    end up actually sharded, and save_checkpoint takes the COLLECTIVE path
    (orbax gets the sharded device arrays directly — no device_get) and can
    be restored. Also exercises save_total_limit rotation."""
    import jax

    tok = UnitTokeniser(load_fe=False, num_units=60)
    rng = np.random.default_rng(2)
    rows = [{"prompt": unit_str(rng.integers(0, 60, 5)),
             "chosen": unit_str([7, 8, 9]),
             "rejected": unit_str(rng.integers(20, 60, 4))} for _ in range(32)]
    model = UnitLM(UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                                vocab_size=64, twist_init=False,
                                torch_dtype="float32"), seed=0)
    args = compose(str(REPO_ROOT / "config"), "preference_alignment_train", [
        "data.train_path=/dev/null", "data.val_path=/dev/null",
        f"training_args.output_dir={tmp_path}/dpo_fsdp",
        "training_args.per_device_train_batch_size=1",
        "training_args.max_steps=3", "training_args.logging_steps=1",
        "training_args.save_steps=1", "training_args.save_total_limit=2",
        "training_args.fsdp=true",
    ]).training_args
    tr = SLAMDPOTrainer(model, tok, args, rows)
    state = tr.train()
    assert state.global_step == 3
    leaves = jax.tree_util.tree_leaves(tr.train_state["params"])
    assert any(not l.sharding.is_fully_replicated for l in leaves)
    # rotation kept only the last save_total_limit checkpoints
    kept = sorted(d for d in (tmp_path / "dpo_fsdp").iterdir()
                  if d.name.startswith("checkpoint-"))
    assert [d.name for d in kept] == ["checkpoint-2", "checkpoint-3"]
    # the collective checkpoint restores onto the sharded mesh
    tr2 = SLAMDPOTrainer(model, tok, args, rows)
    tr2._load_checkpoint(str(tmp_path / "dpo_fsdp" / "checkpoint-3"))
    assert tr2.state.global_step == 3
    for x, y in zip(jax.tree_util.tree_leaves(tr.train_state["params"]),
                    jax.tree_util.tree_leaves(tr2.train_state["params"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_dpo_dropout_active_and_seeded(tmp_path):
    """Nonzero dropout must perturb the DPO policy forward (the reference
    trains the HF model under trl with dropout live), deterministically
    under the state-threaded rng: two same-seed runs agree, dropout-off
    diverges from dropout-on."""
    tok = UnitTokeniser(load_fe=False, num_units=60)
    rng = np.random.default_rng(0)
    rows = [{"prompt": unit_str(rng.integers(0, 60, 5)),
             "chosen": unit_str([7, 8, 9]),
             "rejected": unit_str(rng.integers(20, 60, 4))} for _ in range(16)]

    def losses(dropout, out):
        model = UnitLM(UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                                    vocab_size=62 + tok.offset,
                                    twist_init=False, dropout=dropout,
                                    attn_implementation="xla"), seed=0)
        args = compose(str(REPO_ROOT / "config"), "preference_alignment_train", [
            "data.train_path=/dev/null", "data.val_path=/dev/null",
            f"training_args.output_dir={tmp_path}/{out}",
            "training_args.per_device_train_batch_size=1",
            "training_args.max_steps=3", "training_args.logging_steps=1",
        ]).training_args
        tr = SLAMDPOTrainer(model, tok, args, rows)
        if dropout:
            assert "rng" in tr.train_state
        state = tr.train()
        return [r["loss"] for r in state.log_history if "loss" in r]

    base = losses(0.0, "d0")
    drop_a = losses(0.3, "da")
    drop_b = losses(0.3, "db")
    assert drop_a == drop_b                      # seeded mask stream
    assert any(a != b for a, b in zip(base[1:], drop_a[1:]))  # dropout is live


def test_dpo_checkpoint_resume_equivalence(tmp_path):
    from slamkit_tpu.trainer import TrainerCallback

    tok = UnitTokeniser(load_fe=False, num_units=60)
    rng = np.random.default_rng(1)
    rows = [{"prompt": unit_str(rng.integers(0, 60, 5)),
             "chosen": unit_str([7, 8, 9]),
             "rejected": unit_str(rng.integers(20, 60, 4))} for _ in range(64)]

    class StopAt(TrainerCallback):
        def __init__(self, n):
            self.n = n

        def on_step_end(self, args, state, control, **kw):
            if state.global_step >= self.n:
                control.should_training_stop = True

    def run(out, resume=False, stop_at=None):
        model = UnitLM(UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                                    vocab_size=62 + 2, twist_init=False,
                                    torch_dtype="float32"), seed=0)
        args = compose(str(REPO_ROOT / "config"), "preference_alignment_train", [
            "data.train_path=/dev/null", "data.val_path=/dev/null",
            f"training_args.output_dir={out}",
            "training_args.per_device_train_batch_size=1",
            "training_args.max_steps=4", "training_args.logging_steps=1",
        ]).training_args
        cbs = [StopAt(stop_at)] if stop_at else []
        tr = SLAMDPOTrainer(model, tok, args, rows, callbacks=cbs)
        tr.train(resume_from_checkpoint=resume)
        return model.params

    import jax

    p_straight = run(tmp_path / "a")
    run(tmp_path / "b", stop_at=2)
    p_resumed = run(tmp_path / "b", resume=True)
    for x, y in zip(jax.tree_util.tree_leaves(p_straight),
                    jax.tree_util.tree_leaves(p_resumed)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_dpo_length_buckets_equal_loss_stream(tmp_path):
    """length_buckets=3 pads each batch to a quantile target instead of the
    corpus-global max: the loss/reward stream is unchanged (batch composition
    untouched, pads fully masked) while short batches collate to smaller T
    (VERDICT r3 item 8)."""
    tok = UnitTokeniser(load_fe=False, num_units=60)
    rng = np.random.default_rng(1)
    rows = []
    for i in range(16):
        # long-tail mix: mostly short, a few 10x longer rows
        p_len, c_len = (40, 60) if i % 8 == 7 else (4, 6)
        rows.append({"prompt": unit_str(rng.integers(0, 60, p_len)),
                     "chosen": unit_str(rng.integers(0, 20, c_len)),
                     "rejected": unit_str(rng.integers(20, 60, c_len))})

    def run(out, buckets):
        model = UnitLM(UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                                    vocab_size=62 + tok.offset,
                                    twist_init=False), seed=3)
        args = compose(str(REPO_ROOT / "config"), "preference_alignment_train", [
            "data.train_path=/dev/null", "data.val_path=/dev/null",
            f"training_args.output_dir={out}",
            "training_args.per_device_train_batch_size=1",
            "training_args.max_steps=4", "training_args.logging_steps=1",
            "training_args.save_steps=0",
            f"training_args.length_buckets={buckets}",
        ]).training_args
        tr = SLAMDPOTrainer(model, tok, args, rows)
        state = tr.train()
        return tr, [r["loss"] for r in state.log_history if "loss" in r]

    tr1, losses1 = run(tmp_path / "b1", 1)
    tr3, losses3 = run(tmp_path / "b3", 3)
    # identical up to shape-dependent XLA fusion noise compounding through
    # optimizer steps (pads are masked; step-1 losses match to float eps)
    assert losses1[0] == pytest.approx(losses3[0], rel=1e-6)
    assert losses1 == pytest.approx(losses3, rel=1e-3, abs=1e-4)
    # single-bucket trainer always pads to the global max
    assert tr1.bucket_lens == [tr1.max_len]
    # bucketed trainer has a short target and collates short batches to it
    assert len(tr3.bucket_lens) >= 2
    assert tr3.bucket_lens[-1] == tr3.max_len
    short_T = tr3._collate(tr3.train_rows[:2])["input_ids"].shape[1]
    assert short_T == tr3.bucket_lens[0] < tr3.max_len
    long_T = tr3._collate(tr3.train_rows[6:8])["input_ids"].shape[1]
    assert long_T == tr3.max_len
