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
