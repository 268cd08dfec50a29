"""Config composition tests: the Hydra surface must match the reference
(reference cli/train.py:16, config/** — SURVEY.md §5.6)."""
import pytest

from slamkit_tpu.config import compose, ConfigNode, MissingMandatoryValue


def test_compose_train_defaults(config_dir):
    cfg = compose(config_dir, "train")
    assert cfg.model.tlm_type == "twist"
    assert cfg.model.config_args.twist_init is True
    assert cfg.model.context_len == 512
    assert cfg.model.config_args.base_model_name == "facebook/opt-125m"
    assert cfg.training_args.learning_rate == 1e-3
    assert cfg.training_args.lr_scheduler_kwargs.min_lr == 5e-5
    assert cfg.training_args.max_grad_norm == 0.5
    assert cfg.data.packing is False
    assert cfg.tokeniser.tokeniser_type == "unit"
    # train.yaml overrides load_fe after composing the tokeniser group
    assert cfg.tokeniser.params.load_fe is False
    assert cfg.cont_training is False
    assert cfg.run_time is None


def test_unit_hubert_25_override_chooses_mhubert(config_dir):
    # config/tokeniser/unit_hubert_25.yaml re-chooses the feature_extractor
    # group via `override /tokeniser/feature_extractor: mhubert_25`
    cfg = compose(config_dir, "train")
    fe = cfg.tokeniser.feature_extractor
    assert fe.pretrained_model == "slprl/mhubert-base-25hz"
    assert fe.layer == 11
    assert fe.num_units == 500


def test_group_choice_override(config_dir):
    cfg = compose(config_dir, "train", ["model=slam"])
    assert cfg.model.context_len == 1024
    assert cfg.model.config_args.base_model_name == "Qwen/Qwen2.5-0.5B"
    assert cfg.model.config_args.rope_theta == 10000
    assert cfg.model.config_args.torch_dtype == "bfloat16"
    # slam inherits twist's tlm_type through the sibling defaults chain
    assert cfg.model.tlm_type == "twist"
    assert cfg.model.config_args.twist_init is True


def test_nested_group_choice_override(config_dir):
    cfg = compose(config_dir, "train", ["tokeniser=unit_hubert_l9"])
    assert cfg.tokeniser.feature_extractor.layer == 9
    assert cfg.tokeniser.feature_extractor.pretrained_model == "facebook/hubert-base-ls960"


def test_value_overrides(config_dir):
    cfg = compose(
        config_dir,
        "train",
        [
            "data.train_path=/tmp/x.jsonl",
            "training_args.learning_rate=5e-4",
            "training_args.per_device_train_batch_size=16",
            "+training_args.custom_flag=7",
            "model.config_args.vocab_size=502",
        ],
    )
    assert cfg.data.train_path == "/tmp/x.jsonl"
    assert cfg.training_args.learning_rate == 5e-4
    assert cfg.training_args.per_device_train_batch_size == 16
    assert cfg.training_args.custom_flag == 7
    assert cfg.model.config_args.vocab_size == 502


def test_missing_mandatory_raises(config_dir):
    cfg = compose(config_dir, "train")
    with pytest.raises(MissingMandatoryValue):
        _ = cfg.data.train_path
    assert cfg.data.get("train_path") is None


def test_list_values(config_dir):
    cfg = compose(config_dir, "train_inter_scale")
    assert list(cfg.data.train_ratios) == [0.2023584112, 0.5433262899, 0.2543152989]
    assert cfg.data.packing is True
    assert cfg.tokeniser.tokeniser_type == "interleave"
    assert cfg.tokeniser.params.interleave_method == "poisson"
    assert cfg.tokeniser.params.interleave_span == 10
    assert cfg.model.context_len == 2048
    assert cfg.ds_token_size == 11081736716


def test_list_override_parsing(config_dir):
    cfg = compose(config_dir, "train", ["data.train_path=[/a.jsonl,/b.jsonl]"])
    assert list(cfg.data.train_path) == ["/a.jsonl", "/b.jsonl"]


def test_eval_config(config_dir):
    cfg = compose(config_dir, "eval", ["metric=sblimp"])
    assert cfg.metric.metric_type == "sblimp"
    assert cfg.metric.data_path == "//reference/sblimp"
    assert cfg.metric.subfolder is True
    assert cfg.vocoder.vocoder_type is None
    assert cfg.batch_size == 8


def test_generate_metric_kwargs(config_dir):
    cfg = compose(config_dir, "eval", ["metric=generate"])
    gk = cfg.metric.generate_kwargs
    assert gk.temperature == 0.8
    assert gk.top_k == 25
    assert gk.max_new_tokens == 150
    assert gk.do_sample is True


def test_to_container_roundtrip(config_dir):
    cfg = compose(config_dir, "train", ["data.train_path=x", "data.val_path=y"])
    d = cfg.to_container()
    assert isinstance(d, dict)
    assert d["training_args"]["learning_rate"] == 1e-3
    assert d["data"]["train_path"] == "x"


def test_node_get_and_in():
    cfg = ConfigNode({"a": {"b": 1}, "c": None})
    assert cfg.get("missing", 5) == 5
    assert "a" in cfg
    assert cfg.a.get("b") == 1
    assert cfg.get("c") is None


def test_interpolation():
    cfg = ConfigNode({"a": {"b": 7}, "x": "${a.b}", "y": "pre-${a.b}-post"})
    cfg._set_root(cfg)
    assert cfg.x == 7
    assert cfg.y == "pre-7-post"


def test_delete_override(config_dir):
    cfg = compose(config_dir, "train", ["~run_time"])
    assert "run_time" not in cfg


REPO_ROOT = __import__("pathlib").Path(__file__).resolve().parent.parent


def test_config_name_flag(config_dir):
    """Hydra's --config-name/-cn flags select another recipe (docs/SIMS.md)."""
    from slamkit_tpu.config.compose import main as cfg_main

    captured = {}

    class FakeModule:
        __file__ = str(REPO_ROOT / "cli" / "train.py")

    import sys
    sys.modules["_fake_cli"] = FakeModule

    def fn(cfg):
        captured["cfg"] = cfg

    fn.__module__ = "_fake_cli"
    wrapped = cfg_main("train", "../config")(fn)
    wrapped(["--config-name", "train_inter_scale",
             "data.train_path=[/x]", "data.val_path=[/x]"])
    cfg = captured["cfg"]
    assert cfg.model.context_len == 2048  # the SIMS recipe
    wrapped(["--config-name=train", "data.train_path=/x", "data.val_path=/x"])
    assert captured["cfg"].model.context_len == 512


def test_merge_missing_never_clobbers():
    from slamkit_tpu.config.node import ConfigNode

    cfg = ConfigNode({"lr": 0.001})
    cfg.merge_with({"lr": "???", "new": "???"})
    assert cfg["lr"] == 0.001
    import pytest as _pytest
    from slamkit_tpu.config.node import MissingMandatoryValue
    with _pytest.raises(MissingMandatoryValue):
        cfg["new"]


def test_quoted_sci_notation_stays_string():
    from slamkit_tpu.config.compose import _yaml_load

    out = _yaml_load("a: '1e5'\nb: 1e5\nc: \"2e10\"\n")
    assert out["a"] == "1e5" and isinstance(out["b"], float) and out["c"] == "2e10"


def test_dotted_key_is_value_override(config_dir):
    from slamkit_tpu.config import compose

    # tokeniser.feature_extractor names a group DIR, but a dotted key must be
    # treated as a value-path override (hydra semantics)
    cfg = compose(config_dir, "train", [
        "data.train_path=/x", "data.val_path=/x",
        "tokeniser.feature_extractor=/my/local/ckpt",
    ])
    assert cfg.tokeniser.feature_extractor == "/my/local/ckpt"
    # slash form still selects the group option
    cfg2 = compose(config_dir, "train", [
        "data.train_path=/x", "data.val_path=/x",
        "tokeniser/feature_extractor=hubert_base_l9",
    ])
    assert "hubert" in cfg2.tokeniser.feature_extractor.pretrained_model


def test_list_interpolation_resolves():
    from slamkit_tpu.config.node import ConfigNode

    cfg = ConfigNode({"root": "/data", "paths": ["${root}/train", "${root}/val"]})
    cfg._set_root(cfg)
    assert cfg.paths[0] == "/data/train"
    assert list(cfg.paths) == ["/data/train", "/data/val"]
    assert cfg.to_container()["paths"] == ["/data/train", "/data/val"]


def test_repeated_group_override_last_wins(config_dir):
    """Hydra semantics relied on by the rehearsal harnesses: a later
    model=<variant> group override replaces an earlier one."""
    cfg = compose(config_dir, "train", ["model=slam",
                                       "data.train_path=unused",
                                       "model=slam_dh128"])
    assert int(cfg.model.config_args.head_dim) == 128
    assert int(cfg.model.config_args.num_attention_heads) == 7


def test_multirun_cartesian_sweep():
    """hydra -m: comma-swept overrides fan out into the cartesian product,
    run sequentially; commas inside brackets are list literals, not sweeps
    (reference depends on hydra-core's basic launcher — VERDICT r4 #5)."""
    from slamkit_tpu.config.compose import main as compose_main

    calls = []

    @compose_main(config_name="train", config_path="../config")
    def job(cfg):
        calls.append((int(cfg.model.context_len),
                      int(cfg.training_args.max_steps)))
        return cfg.training_args.mesh_shape

    shapes = job(["-m", "model.context_len=64,128",
                  "training_args.max_steps=1,2",
                  "training_args.mesh_shape=[4,2]",
                  "training_args.output_dir=/tmp/mr",
                  "data.train_path=/dev/null"])
    assert sorted(calls) == [(64, 1), (64, 2), (128, 1), (128, 2)]
    assert all(list(s) == [4, 2] for s in shapes)

    # single-run mode is untouched (one call, no fan-out)
    calls.clear()
    job(["model.context_len=96", "training_args.output_dir=/tmp/mr",
         "data.train_path=/dev/null"])
    assert len(calls) == 1 and calls[0][0] == 96
