"""Smoke test of the accuracy-parity harness (kurosiwo_tpu/parity.py):
a locally-created reference-style SNUNet torch checkpoint, synthetic data,
full convert -> eval -> report path."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")


def test_parity_cli_smoke(tmp_path, capsys):
    import torch

    spec = importlib.util.spec_from_file_location("ref_snunet_p", REF / "models/snunet.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_snunet_p"] = mod
    spec.loader.exec_module(mod)
    tm = mod.SNUNet_ECAM(in_channels=2, out_ch=3, base_channel=32).eval()
    ckpt = tmp_path / "best_segmentation.pt"
    torch.save(tm, ckpt)  # whole-module pickle like segmentation_trainer.py:255

    from kurosiwo_tpu.parity import main

    report = main([
        "--checkpoint", str(ckpt), "--model", "snunet",
        "--batch_size", "8", "--expected-f1", "0.0", "--tolerance", "1000",
    ])
    assert report["model"] == "snunet"
    assert 0.0 <= report["test_mean_f1"] <= 100.0
    assert len(report["per_class_f1"]) == 3
    assert report["f1_within_tolerance"] is True
    out = capsys.readouterr().out
    assert "test_mean_f1" in out and json.loads(out)


def test_engine_pretrained_checkpoint(tmp_path):
    """TaskEngine loads a converted torch checkpoint at init
    (pretrained_checkpoint config key)."""
    import importlib.util
    import sys

    import jax.numpy as jnp
    import torch

    spec = importlib.util.spec_from_file_location("ref_snunet_e", REF / "models/snunet.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_snunet_e"] = mod
    spec.loader.exec_module(mod)
    tm = mod.SNUNet_ECAM(in_channels=2, out_ch=3, base_channel=8).eval()
    ckpt = tmp_path / "snunet.pt"
    torch.save(tm.state_dict(), ckpt)

    from kurosiwo_tpu.models.factory import initialize_cd_model
    from kurosiwo_tpu.training.engine import TaskEngine

    cfg = {
        "task": "cd", "method": "snunet", "num_classes": 3, "num_channels": 2,
        "mixed_precision": False, "inputs": ["pre_event_1", "post_event"],
        "weighted": False, "loss_function": "cross_entropy",
        "log_zone_metrics": False, "log_AOI_metrics": False, "batch_size": 4,
        "pretrained_checkpoint": str(ckpt),
    }
    mcfg = {"backbone": None, "base_channel": 8, "learning_rate": 1e-3, "optimizer": "adam"}
    model = initialize_cd_model(cfg, mcfg)
    engine = TaskEngine(model, cfg, mcfg, "cd", steps_per_epoch=1, init_size=32)
    want = tm.state_dict()["conv0_0.conv1.weight"].detach().numpy()
    got = np.asarray(engine.state.params["conv0_0"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, want.transpose(2, 3, 1, 0), atol=1e-6)


def test_engine_pretrained_encoder(tmp_path):
    """TaskEngine grafts a torchvision-style resnet18 state dict into the
    segmentation encoder at init (pretrained_encoder config key — the
    reference's smp pretrained="imagenet" analogue, model_utilities.py)."""
    import importlib.util
    import sys

    import torch

    spec = importlib.util.spec_from_file_location("ref_bit_rn_e", REF / "models/bit_cd.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_bit_rn_e"] = mod
    spec.loader.exec_module(mod)
    tm = mod.resnet18(3, pretrained=False).eval()
    ckpt = tmp_path / "rn18.pt"
    torch.save(tm.state_dict(), ckpt)

    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.training.engine import TaskEngine

    cfg = {
        "task": "segmentation", "method": "unet", "num_classes": 3,
        "num_channels": 6, "mixed_precision": False,
        "inputs": ["pre_event_1", "pre_event_2", "post_event"],
        "weighted": False, "loss_function": "cross_entropy",
        "log_zone_metrics": False, "log_AOI_metrics": False, "batch_size": 4,
        "pretrained_encoder": str(ckpt),
    }
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "optimizer": "adam"}
    model = initialize_segmentation_model(cfg, mcfg)
    engine = TaskEngine(model, cfg, mcfg, "segmentation", steps_per_epoch=1, init_size=32)
    # a deep layer-1 kernel must equal the torch weights (stem differs: 6ch input)
    want = tm.state_dict()["layer1.0.conv1.weight"].detach().numpy().transpose(2, 3, 1, 0)
    got = np.asarray(
        engine.state.params["encoder"]["layer1_0"]["ConvBNAct_0"]["Conv_0"]["kernel"]
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
