"""Pins the load_config override-merge contract (ADVICE r4, config.py:181).

load_config merges EVERY top-level override into config["model_config"] so
that factories reading method-owned keys via model_config.get() see override
values — including keys the method json doesn't declare. That is safe only
while (a) nothing iterates/serializes model_config wholesale (a stray
top-level knob like batch_size landing there must stay inert), and (b) an
override never silently diverges between config and model_config. Both
invariants are pinned here.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Source files where a wholesale iteration/serialization of model_config
# would turn the inert stray keys into live behavior.
_SCAN_GLOBS = ["kurosiwo_tpu/**/*.py", "main.py", "bench.py"]

# Wholesale-use patterns. `{**configs, **model_configs}` in training/mae.py
# is exempt by construction: both dicts received the identical overrides in
# load_config, so the merge cannot change any value (asserted below).
_WHOLESALE = re.compile(
    r"model_config\w*\.(items|keys|values)\(\)"
    r"|for\s+\w+\s+in\s+(config\[[\"']model_config[\"']\]|model_config)\b"
    r"|json\.dumps?\([^)]*model_config"
)
_ALLOWED = {("kurosiwo_tpu/training/mae.py", r"\{\*\*configs, \*\*model_configs\}")}


def test_no_wholesale_model_config_use():
    hits = []
    for pattern in _SCAN_GLOBS:
        for path in REPO.glob(pattern):
            rel = path.relative_to(REPO).as_posix()
            for i, line in enumerate(path.read_text().splitlines(), 1):
                if _WHOLESALE.search(line):
                    hits.append(f"{rel}:{i}: {line.strip()}")
    assert not hits, (
        "model_config is iterated/serialized wholesale — stray top-level "
        "override keys merged by load_config are no longer inert:\n" + "\n".join(hits)
    )


def test_override_lands_in_both_config_and_model_config():
    from kurosiwo_tpu.config import load_config

    overrides = {
        # a key the unet method json does NOT declare but factories/optim
        # read via model_config.get()
        "weight_decay": 0.123,
        # a plain top-level knob that also lands in model_config (inert)
        "batch_size": 8,
        "synthetic_size": 4,
    }
    cfg = load_config(method="unet", backbone="resnet18",
                      config_root=REPO / "configs", overrides=overrides)
    mcfg = cfg["model_config"]
    for k, v in overrides.items():
        assert cfg[k] == v, f"override {k} lost from config"
        assert mcfg[k] == v, f"override {k} lost from model_config"
    # invariant (b): any key present in both views has the same value, so a
    # wholesale merge of model_config INTO config (training/mae.py:86) can
    # never change behavior
    for k in mcfg:
        if k in cfg:
            assert cfg[k] == mcfg[k], f"config/model_config diverge on {k}"


def test_factory_read_keys_survive_unrelated_override():
    """An override meant as a top-level knob must not perturb the
    factory-read optimizer keys in model_config."""
    from kurosiwo_tpu.config import load_config

    base = load_config(method="unet", backbone="resnet18", config_root=REPO / "configs")
    ov = load_config(method="unet", backbone="resnet18", config_root=REPO / "configs",
                     overrides={"batch_size": 8, "mixed_precision": False})
    for k in ("optimizer", "learning_rate", "weight_decay", "momentum", "betas", "lr_schedule"):
        assert base["model_config"].get(k) == ov["model_config"].get(k), (
            f"unrelated override changed factory-read key {k}"
        )


def test_engine_compiler_options_reach_the_compiler(base_config):
    """Config key `compiler_options` rides jax.jit(compiler_options=...) —
    the only route to backend-owned XLA flags on the axon stack (client
    XLA_FLAGS fatal on TPU-only flags). A valid option must train; a garbage
    option name must fail the compile (proof of forwarding, not a no-op)."""
    import pytest
    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_cd_model
    from kurosiwo_tpu.training.engine import TaskEngine

    cfg = dict(
        base_config, task="cd", method="siam-diff",
        inputs=["pre_event_1", "post_event"], num_channels=2,
        batch_size=8, synthetic_size=8, synthetic_patch_size=32,
        compiler_options={"xla_backend_optimization_level": "2"},
    )
    mcfg = {"learning_rate": 1e-3, "lr_schedule": None, "optimizer": "adam"}
    tr = Loader("train", cfg, 1)
    engine = TaskEngine(initialize_cd_model(cfg, mcfg), cfg, mcfg, "cd",
                        steps_per_epoch=len(tr), seed=1, init_size=32)
    stats = engine.run_train_epoch(tr, 0)
    assert float(stats["mean_loss"]) > 0.0

    bad = dict(cfg, compiler_options={"xla_not_a_real_flag": "1"})
    engine2 = TaskEngine(initialize_cd_model(bad, mcfg), bad, mcfg, "cd",
                         steps_per_epoch=len(tr), seed=1, init_size=32)
    with pytest.raises(Exception, match="(?i)xla_not_a_real_flag|invalid|unknown"):
        engine2.run_train_epoch(tr, 0)


def test_eval_viz_path_emits_preds_and_png(base_config, tmp_path):
    """The eval step only carries preds in aux when a consumer exists
    (viz/wandb); this drives the save_visualizations consumer end to end so
    the gating can never silently strand _log_visualization."""
    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.training.engine import TaskEngine

    cfg = dict(
        base_config, batch_size=8, synthetic_size=8, synthetic_patch_size=32,
        save_visualizations=True, checkpoint_path=str(tmp_path),
    )
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "lr_schedule": None,
            "optimizer": "adam"}
    va = Loader("val", cfg, 1)
    engine = TaskEngine(initialize_segmentation_model(cfg, mcfg), cfg, mcfg,
                        "segmentation", steps_per_epoch=1, seed=1, init_size=32)
    engine.run_eval(va, settype="Val")
    assert (tmp_path / "viz" / "val_sample.png").is_file()
