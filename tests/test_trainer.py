"""Trainer tests on the virtual 8-device CPU mesh: schedules, stoppers, a
2-step train smoke, fsdp sharding, and checkpoint/resume equivalence
(SURVEY.md §4 'integration smoke')."""
import json
import pathlib

import jax
import numpy as np
import pytest

from slamkit_tpu.config import compose
from slamkit_tpu.data.dataset import TokenDataset
from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig
from slamkit_tpu.parallel.mesh import fsdp_spec, make_mesh
from slamkit_tpu.trainer import (MaxTokensStopperCallback, RunTimeStopperCallback,
                                 SLAMTrainer, make_schedule, resolve_warmup_steps)
from slamkit_tpu.trainer.callbacks import TrainerControl, TrainerState, parse_run_time

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


def tiny_model(vocab=64):
    cfg = UnitLMConfig(base_model_name="EleutherAI/pythia-14m", vocab_size=vocab,
                       twist_init=False)
    return UnitLM(cfg, seed=0)


def tiny_dataset(n=64, seed=0, vocab=64, min_len=5, max_len=30):
    rng = np.random.default_rng(seed)
    seqs = [rng.integers(2, vocab, size=rng.integers(min_len, max_len)).tolist()
            for _ in range(n)]
    return TokenDataset.from_lists(seqs)


def train_args(tmp_path, **overrides):
    ov = [f"training_args.output_dir={tmp_path}/out",
          "training_args.per_device_train_batch_size=1",
          "training_args.max_steps=2",
          "training_args.logging_steps=1",
          "training_args.eval_strategy=no",
          "training_args.save_steps=0",
          "data.train_path=/dev/null", "data.val_path=/dev/null"]
    ov += [f"training_args.{k}={v}" for k, v in overrides.items()]
    return compose(str(REPO_ROOT / "config"), "train", ov).training_args


# --------------------------------------------------------------------------- #
# schedules
# --------------------------------------------------------------------------- #
def test_warmup_rule():
    # reference cli/train.py:48-54: warmup = max(steps, ratio * total)
    assert resolve_warmup_steps(100, 0.01, 1000) == 100
    assert resolve_warmup_steps(100, 0.01, 100000) == 1000


def test_cosine_with_min_lr():
    s = make_schedule("cosine_with_min_lr", 1e-3, 1000, warmup_steps=100, min_lr=5e-5)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(100)) == pytest.approx(1e-3, rel=1e-3)
    assert float(s(1000)) == pytest.approx(5e-5, rel=1e-3)
    assert float(s(550)) < 1e-3


def test_parse_run_time():
    assert parse_run_time(90) == 90
    assert parse_run_time("0:01:30") == 90
    assert parse_run_time("1-00:00:10") == 86410


def test_stoppers():
    state, control = TrainerState(), TrainerControl()
    cb = MaxTokensStopperCallback(1000)
    cb.on_train_begin(None, state, control)
    state.num_input_tokens_seen = 999
    cb.on_step_end(None, state, control)
    assert not control.should_training_stop
    state.num_input_tokens_seen = 1000
    cb.on_step_end(None, state, control)
    assert control.should_training_stop and control.should_save

    state, control = TrainerState(), TrainerControl()
    rt = RunTimeStopperCallback(0)
    rt.on_train_begin(None, state, control)
    import time
    time.sleep(0.01)
    rt.on_step_end(None, state, control)
    assert control.should_training_stop


# --------------------------------------------------------------------------- #
# mesh / fsdp
# --------------------------------------------------------------------------- #
def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8  # conftest forces 8 virtual devices
    mesh2 = make_mesh([4, 2])
    assert mesh2.shape == {"data": 4, "model": 2}


def test_fsdp_spec():
    mesh = make_mesh()
    assert fsdp_spec((16, 3), mesh) == jax.sharding.PartitionSpec("data", None)
    assert fsdp_spec((3, 5), mesh) == jax.sharding.PartitionSpec()
    assert fsdp_spec((), mesh) == jax.sharding.PartitionSpec()


# --------------------------------------------------------------------------- #
# training smoke
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("packing", [False, True])
def test_train_two_steps(tmp_path, packing):
    model = tiny_model()
    ds = tiny_dataset()
    args = train_args(tmp_path)
    tr = SLAMTrainer(model, args, ds, eval_dataset=tiny_dataset(8, seed=1),
                     packing=packing, context_len=32)
    state = tr.train()
    assert state.global_step == 2
    assert state.num_input_tokens_seen > 0
    losses = [r["loss"] for r in state.log_history if "loss" in r]
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
    # final checkpoint exists and is loadable as a model
    ckpt = tmp_path / "out" / "checkpoint-2"
    assert ckpt.is_dir()
    back = UnitLM.from_pretrained(str(ckpt))
    assert back.decoder.vocab_size == model.decoder.vocab_size


def test_train_loss_decreases(tmp_path):
    model = tiny_model()
    # learnable structure: cyclic token patterns (random data has no signal)
    rng = np.random.default_rng(0)
    seqs = [[(2 + (s + i) % 4) for i in range(24)] for s in rng.integers(0, 4, 256)]
    ds = TokenDataset.from_lists(seqs)
    args = train_args(tmp_path, max_steps=20, learning_rate=1e-3,
                      warmup_steps=0, warmup_ratio=0.0)
    tr = SLAMTrainer(model, args, ds, context_len=32)
    state = tr.train()
    losses = [r["loss"] for r in state.log_history if "loss" in r]
    assert losses[-1] < losses[0]


def test_grad_accum_matches_big_batch(tmp_path):
    # accum=2 x batch=1(per dev) must equal accum=1 x batch=2 step-for-step
    ds = tiny_dataset(128)

    def run(accum, per_dev):
        cfg = UnitLMConfig(base_model_name="EleutherAI/pythia-14m", vocab_size=64,
                           twist_init=False, torch_dtype="float32")
        model = UnitLM(cfg, seed=0)
        args = train_args(tmp_path, gradient_accumulation_steps=accum,
                          per_device_train_batch_size=per_dev, max_steps=2)
        tr = SLAMTrainer(model, args, ds, packing=True, context_len=32)
        tr.train()
        return model.params

    p1 = run(2, 1)
    p2 = run(1, 2)
    # identical data order (same seed), same total tokens per step
    a = jax.tree_util.tree_leaves(p1)
    b = jax.tree_util.tree_leaves(p2)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-5)


def test_fsdp_train_step(tmp_path):
    model = tiny_model()
    ds = tiny_dataset()
    args = train_args(tmp_path, fsdp="true")
    tr = SLAMTrainer(model, args, ds, context_len=32)
    state = tr.train()
    assert state.global_step == 2
    # params are actually sharded over the mesh
    leaves = jax.tree_util.tree_leaves(tr.train_state["params"])
    assert any(not l.sharding.is_fully_replicated for l in leaves)


def test_checkpoint_resume_equivalence(tmp_path):
    from slamkit_tpu.trainer import TrainerCallback

    ds = tiny_dataset(128)

    class StopAt(TrainerCallback):
        def __init__(self, step):
            self.step = step

        def on_step_end(self, args, state, control, **kw):
            if state.global_step >= self.step:
                control.should_training_stop = True
                control.should_save = True

    def run(out, resume=False, stop_at=None):
        model = tiny_model()
        args = train_args(tmp_path)
        args.output_dir = str(out)
        args.max_steps = 4  # same schedule length in all runs
        args.save_steps = 0
        cbs = [StopAt(stop_at)] if stop_at else []
        tr = SLAMTrainer(model, args, ds, callbacks=cbs, context_len=32)
        tr.train(resume_from_checkpoint=resume)
        return model.params

    # straight 4-step run
    p_straight = run(tmp_path / "a")
    # 2 steps (same 4-step schedule), then resume to 4
    run(tmp_path / "b", stop_at=2)
    p_resumed = run(tmp_path / "b", resume=True)
    for x, y in zip(jax.tree_util.tree_leaves(p_straight),
                    jax.tree_util.tree_leaves(p_resumed)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6)


def test_resume_across_epoch_boundary(tmp_path):
    """A checkpoint saved while an accumulation group straddles an epoch roll
    must resume at the oldest consumed-but-unstepped microbatch of the
    PREVIOUS epoch, not floor at (epoch+1, 0). 3 microbatches/epoch with
    accum=2 makes every second group straddle; save_steps=1 forces the sync
    drain so checkpoint-1 is written while the staged group holds
    (epoch0, mb2)+(epoch1, mb0)."""
    ds = tiny_dataset(24)  # 24 rows / global batch 8 = 3 microbatches/epoch

    def run(out, resume=False, save_steps=0):
        model = tiny_model()
        args = train_args(tmp_path, gradient_accumulation_steps=2)
        args.output_dir = str(out)
        args.max_steps = 2
        args.save_steps = save_steps
        tr = SLAMTrainer(model, args, ds, context_len=32)
        tr.train(resume_from_checkpoint=resume)
        return model.params

    p_straight = run(tmp_path / "a")
    p_saved = run(tmp_path / "b", save_steps=1)
    ckpt1 = str(tmp_path / "b" / "checkpoint-1")
    with open(ckpt1 + "/trainer_state.json") as f:
        saved = json.load(f)
    # the resume point reaches BACK into epoch 0 (the straddling group)
    assert saved["data_pos"] == [0, 2], saved
    p_resumed = run(tmp_path / "c", resume=ckpt1)
    for x, y, z in zip(jax.tree_util.tree_leaves(p_straight),
                       jax.tree_util.tree_leaves(p_saved),
                       jax.tree_util.tree_leaves(p_resumed)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(x), np.asarray(z), rtol=1e-5, atol=1e-6)


def test_periodic_saves_after_offgrid_resume(tmp_path):
    """Resuming from a step that is NOT a save_steps multiple (a budget stop
    or final save lands anywhere) must still produce every later periodic
    checkpoint. Guards the catch-up due-step schedule: an exact-modulo test
    alone cannot distinguish 'fired at the multiple' from 'never fired'."""
    ds = tiny_dataset(128)

    def run(resume=False, **ov):
        model = tiny_model()
        args = train_args(tmp_path, gradient_accumulation_steps=2,
                          save_total_limit=100, **ov)
        tr = SLAMTrainer(model, args, ds, eval_dataset=tiny_dataset(8, seed=1),
                         packing=True, context_len=32)
        tr.train(resume_from_checkpoint=resume)

    # leg 1 stops at the off-grid step 3 (final save -> checkpoint-3)
    run(max_steps=3, save_steps=0)
    # leg 2 resumes at 3 with save_steps=4: due steps are 4, 8 (+ final 10),
    # and the eval/save sync drain runs at the same steps
    run(resume=True, max_steps=10, save_steps=4,
        eval_strategy="steps", eval_steps=4)
    have = sorted(int(p.name.split("-")[1])
                  for p in (tmp_path / "out").iterdir()
                  if p.name.startswith("checkpoint-"))
    assert have == [3, 4, 8, 10], have


def test_async_save_matches_sync(tmp_path):
    """async_save snapshots the state on device BEFORE the next donated step
    reuses its buffers: a mid-run checkpoint written in the background must be
    bit-identical to the synchronous save of the same step."""
    ds = tiny_dataset(128)

    def run(out, async_save):
        model = tiny_model()
        args = train_args(tmp_path, gradient_accumulation_steps=2,
                          save_total_limit=100)
        args.output_dir = str(out)
        args.max_steps = 3   # save at 1 and 2 races the following step
        args.save_steps = 1
        args.async_save = async_save
        SLAMTrainer(model, args, ds, packing=True, context_len=32).train()

    run(tmp_path / "a", async_save=True)
    run(tmp_path / "b", async_save=False)
    import numpy as onp
    for step in (1, 2, 3):
        a = onp.load(tmp_path / "a" / f"checkpoint-{step}" / "params.npz")
        b = onp.load(tmp_path / "b" / f"checkpoint-{step}" / "params.npz")
        assert sorted(a.files) == sorted(b.files)
        for k in a.files:
            onp.testing.assert_array_equal(a[k], b[k], err_msg=f"step{step}:{k}")


def test_token_id_range_counting(tmp_path):
    model = tiny_model()
    ds = tiny_dataset()
    args = train_args(tmp_path, min_token_id_count=10, max_token_id_count=20)
    tr = SLAMTrainer(model, args, ds, context_len=32)
    state = tr.train()
    args_all = train_args(tmp_path)
    tr2 = SLAMTrainer(tiny_model(), args_all, ds, context_len=32)
    state2 = tr2.train()
    assert 0 < state.num_input_tokens_seen < state2.num_input_tokens_seen


def test_tp_shardings_forward_parity():
    """2-D (data, model) mesh: tensor-parallel sharded forward must match the
    replicated forward bit-for-bit (XLA inserts the collectives)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from slamkit_tpu.models.transformer import forward
    from slamkit_tpu.parallel.mesh import make_mesh, tp_shardings

    model = UnitLM(UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                                vocab_size=64, twist_init=False,
                                torch_dtype="float32"), seed=0)
    cfg = model.decoder
    mesh = make_mesh([4, 2])  # data=4, model=2
    shardings = tp_shardings(model.params, mesh)
    sharded = jax.device_put(model.params, shardings)
    # at least the big matmul weights actually got split over 'model'
    assert not sharded["layers"]["up_w"].sharding.is_fully_replicated

    ids = np.arange(64, dtype=np.int32).reshape(4, 16) % 64
    batch_sh = NamedSharding(mesh, P("data"))

    ref, _ = forward(model.params, cfg, ids)
    got = jax.jit(lambda p, x: forward(p, cfg, x)[0],
                  in_shardings=(shardings, batch_sh))(sharded, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_tp_train_step_loss_parity(tmp_path):
    """2-D (data=4, model=2) TP training must match the 1-D data-parallel run
    step for step on the identical global batch stream (VERDICT.md item 7)."""
    ref = SLAMTrainer(tiny_model(), train_args(tmp_path / "dp"), tiny_dataset(),
                      context_len=32)
    s_dp = ref.train()
    tp = SLAMTrainer(tiny_model(),
                     train_args(tmp_path / "tp", mesh_shape="[4,2]",
                                per_device_train_batch_size=2),
                     tiny_dataset(), context_len=32)
    # the model axis is actually in play for the big matmul weights
    leaves = tp.train_state["params"]["layers"]["up_w"].sharding
    assert not leaves.is_fully_replicated
    s_tp = tp.train()
    l_dp = [r["loss"] for r in s_dp.log_history if "loss" in r]
    l_tp = [r["loss"] for r in s_tp.log_history if "loss" in r]
    assert len(l_dp) == len(l_tp) == 2
    np.testing.assert_allclose(l_tp, l_dp, rtol=2e-4)


def test_seq_parallel_train_step_loss_parity(tmp_path):
    """Context parallelism (mesh [4,2] with axes (data, seq); SURVEY §2.8
    stretch goal): the TIME dim of every batch array is sharded over 'seq'
    and XLA inserts the attention gathers — losses must match the 1-D
    data-parallel run step for step on the identical global batch stream."""
    ref = SLAMTrainer(tiny_model(), train_args(tmp_path / "dp"), tiny_dataset(),
                      context_len=32)
    s_dp = ref.train()
    cp = SLAMTrainer(tiny_model(),
                     train_args(tmp_path / "cp", mesh_shape="[4,2]",
                                mesh_axes="[data,seq]",
                                per_device_train_batch_size=2),
                     tiny_dataset(), eval_dataset=tiny_dataset(8, seed=1),
                     context_len=32)
    from jax.sharding import PartitionSpec as P
    assert cp._batch_sh["input_ids"].spec == P(None, "data", "seq")
    s_cp = cp.train()
    l_dp = [r["loss"] for r in s_dp.log_history if "loss" in r]
    l_cp = [r["loss"] for r in s_cp.log_history if "loss" in r]
    assert len(l_dp) == len(l_cp) == 2
    np.testing.assert_allclose(l_cp, l_dp, rtol=2e-4)
    # the time-sharded eval path runs too and matches the 1-D eval
    ref_ev = SLAMTrainer(tiny_model(), train_args(tmp_path / "dp2"),
                         tiny_dataset(), eval_dataset=tiny_dataset(8, seed=1),
                         context_len=32)
    np.testing.assert_allclose(cp.evaluate()["eval_loss"],
                               ref_ev.evaluate()["eval_loss"], rtol=2e-4)


def test_seq_parallel_flash_train_step_loss_parity(tmp_path):
    """Context parallelism WITH the Pallas flash kernel (ring attention,
    VERDICT r4 item 1): mesh [4,2] (data, seq) losses must match the 1-D
    data-parallel flash run step for step on the identical global batch
    stream, packing segments included."""

    def flash_model():
        return UnitLM(UnitLMConfig(
            base_model_name="EleutherAI/pythia-14m", vocab_size=64,
            twist_init=False, attn_implementation="flash_attention_2"), seed=0)

    ref = SLAMTrainer(flash_model(), train_args(tmp_path / "dp"),
                      tiny_dataset(), context_len=256)
    s_dp = ref.train()
    cp = SLAMTrainer(flash_model(),
                     train_args(tmp_path / "cp", mesh_shape="[4,2]",
                                mesh_axes="[data,seq]",
                                per_device_train_batch_size=2),
                     tiny_dataset(), eval_dataset=tiny_dataset(8, seed=1),
                     context_len=256)
    from jax.sharding import PartitionSpec as P
    assert cp._batch_sh["input_ids"].spec == P(None, "data", "seq")
    s_cp = cp.train()
    l_dp = [r["loss"] for r in s_dp.log_history if "loss" in r]
    l_cp = [r["loss"] for r in s_cp.log_history if "loss" in r]
    assert len(l_dp) == len(l_cp) == 2
    np.testing.assert_allclose(l_cp, l_dp, rtol=2e-4)
    # the time-sharded flash eval path runs too and matches the 1-D eval
    ref_ev = SLAMTrainer(flash_model(), train_args(tmp_path / "dp2"),
                         tiny_dataset(), eval_dataset=tiny_dataset(8, seed=1),
                         context_len=256)
    np.testing.assert_allclose(cp.evaluate()["eval_loss"],
                               ref_ev.evaluate()["eval_loss"], rtol=2e-4)


def test_seq_parallel_zigzag_loss_parity(tmp_path):
    """Load-balanced (zigzag) ring CP: the trainer pre-shifts labels,
    permutes the time axis, and runs the half-pair ring — losses and eval
    must match the 1-D data-parallel flash run on the identical stream."""

    def flash_model():
        return UnitLM(UnitLMConfig(
            base_model_name="EleutherAI/pythia-14m", vocab_size=64,
            twist_init=False, attn_implementation="flash_attention_2"), seed=0)

    ref = SLAMTrainer(flash_model(), train_args(tmp_path / "dp"),
                      tiny_dataset(), context_len=512)
    s_dp = ref.train()
    zz = SLAMTrainer(flash_model(),
                     train_args(tmp_path / "zz", mesh_shape="[4,2]",
                                mesh_axes="[data,seq]",
                                cp_schedule="zigzag",
                                per_device_train_batch_size=2),
                     tiny_dataset(), eval_dataset=tiny_dataset(8, seed=1),
                     context_len=512)
    s_zz = zz.train()
    l_dp = [r["loss"] for r in s_dp.log_history if "loss" in r]
    l_zz = [r["loss"] for r in s_zz.log_history if "loss" in r]
    assert len(l_dp) == len(l_zz) == 2
    np.testing.assert_allclose(l_zz, l_dp, rtol=2e-4)
    ref_ev = SLAMTrainer(flash_model(), train_args(tmp_path / "dp2"),
                         tiny_dataset(), eval_dataset=tiny_dataset(8, seed=1),
                         context_len=512)
    np.testing.assert_allclose(zz.evaluate()["eval_loss"],
                               ref_ev.evaluate()["eval_loss"], rtol=2e-4)


def test_seq_parallel_guards(tmp_path):
    """CP refuses flash chunks below lane alignment, indivisible contexts,
    and unknown mesh axis names."""
    from slamkit_tpu.models.unit_lm import UnitLM, UnitLMConfig

    flash_model = UnitLM(UnitLMConfig(
        base_model_name="EleutherAI/pythia-14m", vocab_size=64,
        twist_init=False, attn_implementation="flash_attention_2"), seed=0)
    with pytest.raises(ValueError, match="lane-aligned"):
        SLAMTrainer(flash_model,
                    train_args(tmp_path / "a", mesh_shape="[4,2]",
                               mesh_axes="[data,seq]",
                               per_device_train_batch_size=2),
                    tiny_dataset(), context_len=32)
    with pytest.raises(ValueError, match="not divisible"):
        SLAMTrainer(tiny_model(),
                    train_args(tmp_path / "b", mesh_shape="[2,4]",
                               mesh_axes="[data,seq]",
                               per_device_train_batch_size=4),
                    tiny_dataset(), context_len=30)
    with pytest.raises(ValueError, match="mesh axes"):
        make_mesh([4, 2], ("data", "pipeline"))


def test_tp_fsdp_combined_shardings(tmp_path):
    """mesh [4,2] + fsdp: TP claims the Megatron dim, ZeRO-3 shards a
    remaining dim over 'data'; training still steps."""
    tr = SLAMTrainer(tiny_model(),
                     train_args(tmp_path, mesh_shape="[4,2]", fsdp="true",
                                per_device_train_batch_size=2),
                     tiny_dataset(), context_len=32)
    spec = tr.train_state["params"]["layers"]["up_w"].sharding.spec
    flat = [a for dim in spec if dim is not None
            for a in (dim if isinstance(dim, tuple) else (dim,))]
    assert "model" in flat and "data" in flat
    state = tr.train()
    assert state.global_step == 2
    assert all(np.isfinite(r["loss"]) for r in state.log_history if "loss" in r)


def test_adam_compact_matches_optax_in_f32():
    """scale_by_adam_compact with f32 state must reproduce optax.scale_by_adam
    exactly; in bf16 state it must stay close."""
    import jax.numpy as jnp
    import optax

    from slamkit_tpu.trainer.optim import scale_by_adam_compact

    params = {"w": jnp.arange(12.0).reshape(3, 4) / 7.0, "b": jnp.ones((4,))}
    grads = {"w": jnp.cos(jnp.arange(12.0)).reshape(3, 4), "b": jnp.full((4,), 0.3)}
    ref = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    got = scale_by_adam_compact(0.9, 0.999, 1e-8, jnp.float32)
    s_ref, s_got = ref.init(params), got.init(params)
    for _ in range(5):
        u_ref, s_ref = ref.update(grads, s_ref)
        u_got, s_got = got.update(grads, s_got)
    for k in params:
        np.testing.assert_allclose(u_got[k], u_ref[k], rtol=1e-6)

    bf = scale_by_adam_compact(0.9, 0.999, 1e-8, jnp.bfloat16)
    s_bf = bf.init(params)
    for _ in range(5):
        u_bf, s_bf = bf.update(grads, s_bf)
    for k in params:
        assert s_bf.mu[k].dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(u_bf[k], np.float32),
                                   np.asarray(u_ref[k], np.float32),
                                   rtol=0.05, atol=0.05)


@pytest.mark.parametrize("overrides", [
    {"optim_state_dtype": "bfloat16"},
    {"optim": "adafactor"},
    # adafactor's factored v_row/v_col leaves have a DIFFERENT shape than
    # their param: opt_state_shardings must replicate them instead of
    # applying the param's (rank-mismatched) fsdp spec
    {"optim": "adafactor", "fsdp": "true"},
])
def test_optimizer_variants_train(tmp_path, overrides):
    """bf16 AdamW moments / adafactor: the 2-step train still runs and the
    loss is finite (the states that unlock no-remat on 16G — VERDICT item 4)."""
    tr = SLAMTrainer(tiny_model(), train_args(tmp_path, **overrides),
                     tiny_dataset(), context_len=32)
    state = tr.train()
    assert state.global_step == 2
    assert all(np.isfinite(r["loss"]) for r in state.log_history if "loss" in r)


def test_train_with_dropout(tmp_path):
    """model.dropout > 0: the step carries a dropout rng in train_state (so
    checkpoints resume the exact mask stream), losses stay finite, and resume
    reproduces the straight run bit-for-bit."""
    from slamkit_tpu.trainer import TrainerCallback

    ds = tiny_dataset(64)

    class StopAt(TrainerCallback):
        def __init__(self, step):
            self.step = step

        def on_step_end(self, args, state, control, **kw):
            if state.global_step >= self.step:
                control.should_training_stop = True
                control.should_save = True

    def run(out, resume=False, stop_at=None):
        cfg = UnitLMConfig(base_model_name="EleutherAI/pythia-14m",
                           vocab_size=64, twist_init=False, dropout=0.2,
                           layerdrop=0.1)
        model = UnitLM(cfg, seed=0)
        args = train_args(tmp_path)
        args.output_dir = str(out)
        args.max_steps = 4  # same schedule length in all runs
        args.save_steps = 0
        cbs = [StopAt(stop_at)] if stop_at else []
        tr = SLAMTrainer(model, args, ds, callbacks=cbs, context_len=32)
        tr.train(resume_from_checkpoint=resume)
        return model.params, tr

    p_straight, tr = run(tmp_path / "a")
    assert "rng" in tr.train_state
    assert all(np.isfinite(r["loss"]) for r in tr.state.log_history if "loss" in r)
    run(tmp_path / "b", stop_at=2)
    p_resumed, tr_resumed = run(tmp_path / "b", resume=True)
    # the restored rng key continues the straight run's exact mask stream
    np.testing.assert_array_equal(np.asarray(tr.train_state["rng"]),
                                  np.asarray(tr_resumed.train_state["rng"]))
    for x, y in zip(jax.tree_util.tree_leaves(p_straight),
                    jax.tree_util.tree_leaves(p_resumed)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_adafactor_descends_with_decoupled_decay(tmp_path):
    """The explicit adafactor chain must (a) descend — optax.adafactor ends
    in scale(-1), so naively appending scale_by_learning_rate would ASCEND —
    and (b) apply `weight_decay` as lr-scaled decoupled decay like the adamw
    path, not adafactor's multiplicative weight_decay_rate."""
    import jax
    import jax.numpy as jnp

    from slamkit_tpu.trainer.optim import make_optimizer

    def run(optim, weight_decay):
        args = train_args(tmp_path, optim=optim, weight_decay=weight_decay,
                          learning_rate=0.05, lr_scheduler_type="constant",
                          warmup_steps=0)
        tx, _ = make_optimizer(args, total_steps=100)
        params = {"w": jnp.array([4.0, -2.0, 7.0])}
        loss_fn = lambda p: jnp.sum((p["w"] - 3.0) ** 2)
        state = tx.init(params)
        first = float(loss_fn(params))
        for _ in range(100):
            grads = jax.grad(loss_fn)(params)
            updates, state = tx.update(grads, state, params)
            params = optax_apply(params, updates)
        return first, float(loss_fn(params)), params

    import optax

    def optax_apply(p, u):
        return optax.apply_updates(p, u)

    first, last, p_nodecay = run("adafactor", 0.0)
    assert last < first * 0.05, (first, last)  # descends, by a lot
    _, _, p_decay = run("adafactor", 1.0)
    # decoupled decay pulls the optimum toward 0
    assert float(jnp.abs(p_decay["w"]).sum()) < float(jnp.abs(p_nodecay["w"]).sum())


def test_last_group_flushes_on_epoch_budget(tmp_path):
    """num_train_epochs mode with the data stream ending right as the final
    accumulation group is staged: the pipelined loop must flush and step it
    (not drop it on the floor)."""
    model = tiny_model()
    # 8 rows x ctx 32, global batch 8 (8 devices x 1), accum 2 -> the stream
    # yields exactly 2 groups per epoch
    rng = np.random.default_rng(0)
    seqs = [rng.integers(2, 64, size=32).tolist() for _ in range(32)]
    ds = TokenDataset.from_lists(seqs)
    args = train_args(tmp_path, gradient_accumulation_steps=2)
    args.max_steps = None
    args.num_train_epochs = 1
    tr = SLAMTrainer(model, args, ds, context_len=32)
    state = tr.train()
    assert state.global_step == tr.total_steps == 2


def test_latest_checkpoint_skips_incomplete_dirs(tmp_path):
    """A run killed between the orbax state rename and the trainer_state.json
    write leaves a state-only dir; resume must fall back to the newest
    COMPLETE checkpoint instead of crashing on the missing json."""
    from slamkit_tpu.trainer import checkpoint

    def make(step, state=True, json_file=True):
        d = tmp_path / f"checkpoint-{step}"
        (d / "state").mkdir(parents=True) if state else d.mkdir(parents=True)
        if json_file:
            (d / "trainer_state.json").write_text("{}")

    make(100)
    make(200, json_file=False)      # killed mid-save
    make(300, state=False)          # host artifacts only (no orbax payload)
    got = checkpoint.latest_checkpoint(str(tmp_path))
    assert got and got.endswith("checkpoint-100")


def test_resume_rejects_changed_packing_strategy(tmp_path):
    """The resume fast-forward replays the recorded batch stream; silently
    resuming under a different packing strategy would skip/duplicate data."""
    ds = tiny_dataset(64)
    args = train_args(tmp_path, max_steps=2)
    args.save_steps = 0
    tr = SLAMTrainer(tiny_model(), args, ds, packing=True, context_len=32,
                     packing_strategy="bestfit")
    tr.train()
    tr2 = SLAMTrainer(tiny_model(), args, ds, packing=True, context_len=32,
                      packing_strategy="greedy")
    with pytest.raises(ValueError, match="packing_strategy"):
        tr2.train(resume_from_checkpoint=True)


def test_async_allowed_forces_sync_on_multihost():
    """Background saves issue collectives from a worker thread; with >1
    process the cross-process issue order becomes nondeterministic, so
    async must silently degrade to the synchronous path."""
    from slamkit_tpu.trainer import checkpoint
    assert checkpoint.async_allowed(True, 1) is True
    assert checkpoint.async_allowed(True, 4) is False
    assert checkpoint.async_allowed(False, 1) is False


def test_save_host_artifacts_atomic_and_nonmutating(tmp_path):
    """trainer_state.json must appear via rename (no .tmp leftovers) and the
    export must NOT reassign the live model's params — it runs on the async
    saver thread concurrently with training."""
    import json as _json
    import os

    import jax.numpy as jnp

    from slamkit_tpu.trainer import checkpoint

    class M:
        def __init__(self):
            self.params = {"w": np.ones(2)}
            self.exported = None

        def save_pretrained(self, path, params=None):
            self.exported = params

    m = M()
    orig = m.params
    state = {"params": {"w": jnp.zeros(2)}}
    checkpoint.save_host_artifacts(str(tmp_path), {"global_step": 3}, m, state)
    assert m.params is orig
    with open(tmp_path / "trainer_state.json") as f:
        assert _json.load(f) == {"global_step": 3}
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
    np.testing.assert_array_equal(np.asarray(m.exported["w"]), 0.0)
