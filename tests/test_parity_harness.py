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


def _load_ref(relpath: str, name: str):
    spec = importlib.util.spec_from_file_location(name, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub_timm():
    """The reference changeformer imports timm (absent here) for
    DropPath/to_2tuple/trunc_normal_ — same stub as test_convert_parity.py."""
    import importlib.machinery
    import types

    import torch
    import torch.nn as tnn

    class _DropPath(tnn.Identity):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = _DropPath
    timm_layers.to_2tuple = lambda t: t if isinstance(t, tuple) else (t, t)
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    for _m in (timm, timm_models, timm_layers):
        _m.__spec__ = importlib.machinery.ModuleSpec(_m.__name__, loader=None)
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)


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


def _torch_oracle_f1(torch_model, test_loader, assemble, two_input):
    """Reference-side eval: same loader, same split, mean F1 over classes 0-2."""
    import torch

    cm = np.zeros((4, 4), np.int64)
    with torch.no_grad():
        for batch in test_loader:
            inp = assemble(batch)
            if two_input:
                out = torch_model(*[torch.from_numpy(x) for x in inp])
            else:
                out = torch_model(torch.from_numpy(inp))
            preds = out.argmax(dim=1).numpy()
            mask = np.asarray(batch["mask"]).copy()
            sw = np.asarray(batch.get("sample_weight"))
            if sw is not None:
                mask[sw <= 0] = 3  # eval padding samples are excluded
            valid = mask != 3
            np.add.at(cm, (mask[valid], preds[valid]), 1)
    tp = np.diag(cm)[:3]
    fp = cm[:, :3].sum(axis=0)[:3] - tp
    fn = cm[:3, :].sum(axis=1) - tp
    f1 = 2 * tp / np.maximum(2 * tp + fp + fn, 1e-12)
    return 100.0 * f1.mean()


def test_parity_roundtrip_snunet_oracle_f1(tmp_path):
    """Full launch-readiness round trip (VERDICT r2 item 10): a reference-
    format whole-module best_segmentation.pt -> `python -m kurosiwo_tpu.parity`
    -> F1 delta vs the torch oracle evaluated on the SAME synthetic test split
    is within the +-0.5-point BASELINE tolerance."""
    import json as _json

    import torch

    spec = importlib.util.spec_from_file_location("ref_snunet_rt", REF / "models/snunet.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_snunet_rt"] = mod
    spec.loader.exec_module(mod)
    tm = mod.SNUNet_ECAM(in_channels=2, out_ch=3, base_channel=32)

    override = {"synthetic_size": 8, "synthetic_patch_size": 112, "mixed_precision": False}

    from kurosiwo_tpu.config import load_config
    from kurosiwo_tpu.data.pipeline import prepare_loaders

    cfg = load_config(
        method="snunet",
        overrides={"task": "cd", "batch_size": 8,
                   "inputs": ["pre_event_1", "post_event"], **override},
    )
    cfg["mixed_precision"] = False
    train_loader, _, test_loader = prepare_loaders(cfg, seed=999)

    def assemble(batch):
        to_nchw = lambda x: np.asarray(x, np.float32).transpose(0, 3, 1, 2)
        return (to_nchw(batch["pre1"]), to_nchw(batch["post"]))

    # Briefly TRAIN the oracle: a random-init head has measure-significant
    # near-tie level sets, so its argmax flips under ~5e-4 framework numeric
    # differences and F1 deltas become noise (observed ~5 pts). A few train
    # steps make predictions decisive and the F1 comparison meaningful.
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    ce = torch.nn.CrossEntropyLoss(ignore_index=3)
    tm.train()
    for _ in range(10):
        for batch in train_loader:
            x1, x2 = (torch.from_numpy(x) for x in assemble(batch))
            mask = torch.from_numpy(np.asarray(batch["mask"])).long()
            opt.zero_grad()
            loss = ce(tm(x1, x2), mask)
            loss.backward()
            opt.step()
    tm = tm.eval()
    ckpt = tmp_path / "best_segmentation.pt"
    torch.save(tm, ckpt)

    oracle_f1 = _torch_oracle_f1(tm, test_loader, assemble, two_input=True)

    from kurosiwo_tpu.parity import main

    report = main([
        "--checkpoint", str(ckpt), "--model", "snunet", "--batch_size", "8",
        "--override", _json.dumps(override),
        "--expected-f1", str(oracle_f1), "--tolerance", "0.5",
    ])
    assert report["f1_within_tolerance"] is True, report
    assert abs(report["delta_f1"]) < 0.5


def test_parity_roundtrip_bit_cd_oracle_f1(tmp_path):
    """bit-cd round trip (VERDICT r3 item 8): the CD trainer's state-dict
    checkpoint format {epoch, model_state_dict, ...}
    (change_detection_trainer.py:305-322) -> `python -m kurosiwo_tpu.parity`
    -> F1 delta vs the torch oracle within the +-0.5-point tolerance."""
    import json as _json

    import torch

    ref_mod = _load_ref("models/bit_cd.py", "ref_bit_rt")
    tm = ref_mod.define_G(
        {"net_G": "base_resnet18", "init_type": "normal", "init_gain": 0.02}, in_channels=2
    )

    override = {"synthetic_size": 8, "synthetic_patch_size": 112, "mixed_precision": False}

    from kurosiwo_tpu.config import load_config
    from kurosiwo_tpu.data.pipeline import prepare_loaders

    cfg = load_config(
        method="bit-cd",
        overrides={"task": "cd", "batch_size": 8,
                   "inputs": ["pre_event_1", "post_event"], **override},
    )
    cfg["mixed_precision"] = False
    train_loader, _, test_loader = prepare_loaders(cfg, seed=999)

    def assemble(batch):
        to_nchw = lambda x: np.asarray(x, np.float32).transpose(0, 3, 1, 2)
        return (to_nchw(batch["pre1"]), to_nchw(batch["post"]))

    opt = torch.optim.SGD(tm.parameters(), lr=1e-2, momentum=0.9)
    ce = torch.nn.CrossEntropyLoss(ignore_index=3)
    tm.train()
    for _ in range(10):
        for batch in train_loader:
            x1, x2 = (torch.from_numpy(x) for x in assemble(batch))
            mask = torch.from_numpy(np.asarray(batch["mask"])).long()
            opt.zero_grad()
            loss = ce(tm(x1, x2), mask)
            loss.backward()
            opt.step()
    tm = tm.eval()
    # the CD trainers save state dicts wrapped in a metadata dict
    ckpt = tmp_path / "best_segmentation_cd.pt"
    torch.save({"epoch": 9, "model_state_dict": tm.state_dict(), "loss": 0.0}, ckpt)

    oracle_f1 = _torch_oracle_f1(tm, test_loader, assemble, two_input=True)

    from kurosiwo_tpu.parity import main

    report = main([
        "--checkpoint", str(ckpt), "--model", "bit-cd", "--batch_size", "8",
        "--override", _json.dumps(override),
        "--expected-f1", str(oracle_f1), "--tolerance", "0.5",
    ])
    assert report["f1_within_tolerance"] is True, report
    assert abs(report["delta_f1"]) < 0.5


def test_parity_roundtrip_changeformer_oracle_f1(tmp_path):
    """changeformer round trip (VERDICT r3 item 8): multi-scale head model
    through the same CD state-dict format and the parity CLI."""
    import json as _json

    import torch

    _stub_timm()
    ref_mod = _load_ref("models/changeformer.py", "ref_cf_rt")
    tm = ref_mod.ChangeFormerV6(
        input_nc=2, output_nc=3, decoder_softmax=False, embed_dim=64
    )

    override = {
        "synthetic_size": 8, "synthetic_patch_size": 64, "mixed_precision": False,
        "embed_dim": 64, "decoder_softmax": False,
    }

    from kurosiwo_tpu.config import load_config
    from kurosiwo_tpu.data.pipeline import prepare_loaders

    cfg = load_config(
        method="changeformer",
        overrides={"task": "cd", "batch_size": 8,
                   "inputs": ["pre_event_1", "post_event"], **override},
    )
    cfg["mixed_precision"] = False
    train_loader, _, test_loader = prepare_loaders(cfg, seed=999)

    def assemble(batch):
        to_nchw = lambda x: np.asarray(x, np.float32).transpose(0, 3, 1, 2)
        return (to_nchw(batch["pre1"]), to_nchw(batch["post"]))

    class _LastHead(torch.nn.Module):
        """Oracle eval surface: the trainer consumes output[-1] when
        multi_scale_infer is off (change_detection_trainer.py:138-166)."""

        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, x1, x2):
            return self.inner(x1, x2)[-1]

    opt = torch.optim.SGD(tm.parameters(), lr=1e-2, momentum=0.9)
    ce = torch.nn.CrossEntropyLoss(ignore_index=3)
    tm.train()
    for _ in range(10):
        for batch in train_loader:
            x1, x2 = (torch.from_numpy(x) for x in assemble(batch))
            mask = torch.from_numpy(np.asarray(batch["mask"])).long()
            opt.zero_grad()
            loss = ce(tm(x1, x2)[-1], mask)
            loss.backward()
            opt.step()
    tm = tm.eval()
    ckpt = tmp_path / "best_segmentation_cf.pt"
    torch.save({"epoch": 9, "model_state_dict": tm.state_dict(), "loss": 0.0}, ckpt)

    oracle_f1 = _torch_oracle_f1(_LastHead(tm).eval(), test_loader, assemble, two_input=True)

    from kurosiwo_tpu.parity import main

    report = main([
        "--checkpoint", str(ckpt), "--model", "changeformer", "--batch_size", "8",
        "--override", _json.dumps(override),
        "--expected-f1", str(oracle_f1), "--tolerance", "0.5",
    ])
    assert report["f1_within_tolerance"] is True, report
    assert abs(report["delta_f1"]) < 0.5


def test_parity_roundtrip_floodvit_finetune(tmp_path):
    """floodvit finetune round trip: a reference-format FinetunerSegmentation
    checkpoint (ViT encoder + mlp head, model_utilities.py:50-94) through the
    parity CLI, delta vs the torch oracle ~0."""
    import json as _json

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_vit_rt", REF / "models/vision_transformer.py"
    )
    vmod = importlib.util.module_from_spec(spec)
    sys.modules["ref_vit_rt"] = vmod
    spec.loader.exec_module(vmod)
    import einops as _einops
    import torch.nn as nn

    # model_utilities.py imports denoising_diffusion_pytorch/torchsummary
    # (absent in this image), so replicate its 15-line FinetunerSegmentation
    # wiring (model_utilities.py:50-94) verbatim: same attribute names =>
    # byte-identical state_dict layout, same forward math.
    class Finetuner(nn.Module):
        def __init__(self, encoder, configs):
            super().__init__()
            self.configs = configs
            self.model = encoder
            self.model.pool = False
            self.head = nn.Sequential(
                nn.Conv2d(encoder.mlp_head.in_features, 512, kernel_size=1),
                nn.ReLU(),
                nn.Conv2d(512, configs["num_classes"], kernel_size=1),
            )
            self.model.mlp_head = nn.Identity()

        def forward(self, x):
            gs = 224 // self.configs["finetuning_patch_size"]
            x = self.model(x)
            x = _einops.rearrange(x, "b (h w) c -> b (c) h w", h=gs, w=gs)
            x = nn.Upsample(size=(224, 224), mode="bilinear")(x)
            return self.head(x)

    dims = {"dim": 64, "depth": 2, "heads": 2, "mlp_dim": 128}
    vit = vmod.ViT(
        image_size=224, patch_size=16, num_classes=3, channels=6, pool="cls", **dims
    )
    fcfg = {"mlp": True, "decoder": False, "num_classes": 3,
            "finetuning_patch_size": 16, "image_size": 224}
    tm = Finetuner(encoder=vit, configs=fcfg).eval()
    ckpt = tmp_path / "floodvit_finetuned.pt"
    torch.save(tm.state_dict(), ckpt)

    override = {"synthetic_size": 8, "mixed_precision": False, **dims}

    from kurosiwo_tpu.config import load_config
    from kurosiwo_tpu.data.pipeline import prepare_loaders

    cfg = load_config(
        method="finetune", overrides={"task": "segmentation", "batch_size": 8, **override}
    )
    cfg["mixed_precision"] = False
    _, _, test_loader = prepare_loaders(cfg, seed=999)

    def assemble(batch):
        x = np.concatenate(
            [np.asarray(batch["post"]), np.asarray(batch["pre1"]), np.asarray(batch["pre2"])],
            axis=-1,
        )
        return x.astype(np.float32).transpose(0, 3, 1, 2)

    oracle_f1 = _torch_oracle_f1(tm, test_loader, assemble, two_input=False)

    from kurosiwo_tpu.parity import main

    report = main([
        "--checkpoint", str(ckpt), "--model", "finetune", "--batch_size", "8",
        "--override", _json.dumps(override),
        "--expected-f1", str(oracle_f1), "--tolerance", "0.5",
    ])
    assert report["f1_within_tolerance"] is True, report


def _brief_train_cd(tm, train_loader, assemble, epochs=10, lr=1e-2):
    """Briefly train a torch CD oracle so its argmax is decisive (see the
    snunet round trip's rationale: random-init level sets flip under ~5e-4
    framework numeric differences)."""
    import torch

    opt = torch.optim.SGD(tm.parameters(), lr=lr, momentum=0.9)
    ce = torch.nn.CrossEntropyLoss(ignore_index=3)
    tm.train()
    for _ in range(epochs):
        for batch in train_loader:
            x1, x2 = (torch.from_numpy(x) for x in assemble(batch))
            mask = torch.from_numpy(np.asarray(batch["mask"])).long()
            opt.zero_grad()
            out = tm(x1, x2)
            ce(out, mask).backward()
            opt.step()
    return tm.eval()


def _cd_roundtrip(tmp_path, method, torch_model, override, epochs=10, lr=1e-2):
    """Shared CD round trip: brief-train the torch oracle, save in the CD
    trainer's state-dict format (change_detection_trainer.py:305-322), run
    `python -m kurosiwo_tpu.parity`, assert F1 delta within the +-0.5-pt
    BASELINE tolerance (VERDICT r4 item 6)."""
    import json as _json

    import torch

    from kurosiwo_tpu.config import load_config
    from kurosiwo_tpu.data.pipeline import prepare_loaders

    cfg = load_config(
        method=method,
        overrides={"task": "cd", "batch_size": 8,
                   "inputs": ["pre_event_1", "post_event"], **override},
    )
    cfg["mixed_precision"] = False
    train_loader, _, test_loader = prepare_loaders(cfg, seed=999)

    def assemble(batch):
        to_nchw = lambda x: np.asarray(x, np.float32).transpose(0, 3, 1, 2)
        return (to_nchw(batch["pre1"]), to_nchw(batch["post"]))

    tm = _brief_train_cd(torch_model, train_loader, assemble, epochs=epochs, lr=lr)
    ckpt = tmp_path / f"best_segmentation_{method}.pt"
    torch.save({"epoch": epochs - 1, "model_state_dict": tm.state_dict(), "loss": 0.0}, ckpt)

    oracle_f1 = _torch_oracle_f1(tm, test_loader, assemble, two_input=True)

    from kurosiwo_tpu.parity import main

    report = main([
        "--checkpoint", str(ckpt), "--model", method, "--batch_size", "8",
        "--override", _json.dumps(override),
        "--expected-f1", str(oracle_f1), "--tolerance", "0.5",
    ])
    assert report["f1_within_tolerance"] is True, report
    assert abs(report["delta_f1"]) < 0.5


def test_parity_roundtrip_hfanet_oracle_f1(tmp_path):
    """hfa-net round trip (VERDICT r4 item 6): frequency-bank model through
    the CD state-dict format and the parity CLI.

    The reference model is architecturally pinned to 224x224 input (the
    Decoder hardcodes input_size=14 = 224/16, hfanet.py:619, and the HFAB
    pooling kernels are only shape-consistent at 224), and a full torch
    fwd+bwd at 224 is >2 min on the 1-CPU test box — so the oracle is made
    decisive by training ONLY the final 1x1 classifier on features cached
    from single no-grad forwards: the backbone stays frozen at init (BN
    eval running stats identical on both sides), and everything upstream
    of the trained head is unchanged, so cached features stand in exactly
    for a full re-forward. Batch/sample count is 8: the parity CLI eval
    shards the batch over the 8-device test mesh, so the batch must divide
    by 8 (the failure mode the first 4-sample draft of this test hit)."""
    import json as _json

    import torch

    ref_mod = _load_ref("models/hfanet.py", "ref_hfa_rt")
    tm = ref_mod.HFANet(input_channel=2, input_size=224, num_classes=3).eval()

    override = {"synthetic_size": 8, "synthetic_patch_size": 224, "mixed_precision": False}

    from kurosiwo_tpu.config import load_config
    from kurosiwo_tpu.data.pipeline import prepare_loaders

    cfg = load_config(
        method="hfa-net",
        overrides={"task": "cd", "batch_size": 8,
                   "inputs": ["pre_event_1", "post_event"], **override},
    )
    cfg["mixed_precision"] = False
    train_loader, _, test_loader = prepare_loaders(cfg, seed=999)

    def assemble(batch):
        to_nchw = lambda x: np.asarray(x, np.float32).transpose(0, 3, 1, 2)
        return (to_nchw(batch["pre1"]), to_nchw(batch["post"]))

    head = tm.decoder._out_layer[-1]  # final 1x1 conv (32 -> num_classes)
    cache = []
    hook = head.register_forward_pre_hook(lambda m, inp: cache.append(inp[0].detach()))

    def collect(loader):
        feats, masks, sws = [], [], []
        with torch.no_grad():
            for batch in loader:
                cache.clear()
                x1, x2 = (torch.from_numpy(x) for x in assemble(batch))
                tm(x1, x2)
                feats.append(cache[-1])
                masks.append(torch.from_numpy(np.asarray(batch["mask"])).long())
                sw = batch.get("sample_weight")
                sws.append(np.asarray(sw) if sw is not None
                           else np.ones(len(masks[-1]), np.float32))
        return torch.cat(feats), torch.cat(masks), np.concatenate(sws)

    f_tr, m_tr, _ = collect(train_loader)
    f_te, m_te, sw_te = collect(test_loader)
    hook.remove()

    opt = torch.optim.Adam(head.parameters(), lr=5e-2)
    ce = torch.nn.CrossEntropyLoss(ignore_index=3)
    for _ in range(150):
        opt.zero_grad()
        ce(head(f_tr), m_tr).backward()
        opt.step()

    # oracle predictions straight from the cached features — exact, because
    # everything upstream of the trained head is frozen
    with torch.no_grad():
        preds = head(f_te).argmax(dim=1).numpy()
    mask = m_te.numpy().copy()
    mask[sw_te <= 0] = 3
    cm = np.zeros((4, 4), np.int64)
    valid = mask != 3
    np.add.at(cm, (mask[valid], preds[valid]), 1)
    tp = np.diag(cm)[:3]
    fp = cm[:, :3].sum(axis=0)[:3] - tp
    fn = cm[:3, :].sum(axis=1) - tp
    oracle_f1 = 100.0 * (2 * tp / np.maximum(2 * tp + fp + fn, 1e-12)).mean()

    ckpt = tmp_path / "best_segmentation_hfa.pt"
    torch.save({"epoch": 0, "model_state_dict": tm.state_dict(), "loss": 0.0}, ckpt)

    from kurosiwo_tpu.parity import main

    report = main([
        "--checkpoint", str(ckpt), "--model", "hfa-net", "--batch_size", "8",
        "--override", _json.dumps(override),
        "--expected-f1", str(oracle_f1), "--tolerance", "0.5",
    ])
    assert report["f1_within_tolerance"] is True, report
    assert abs(report["delta_f1"]) < 0.5


def test_parity_roundtrip_adhr_cdnet_oracle_f1(tmp_path):
    """adhr-cdnet round trip (VERDICT r4 item 6)."""
    ref_mod = _load_ref("models/adhr_cdnet.py", "ref_adhr_rt")
    tm = ref_mod.ADHR(2, 3)
    override = {"synthetic_size": 8, "synthetic_patch_size": 64, "mixed_precision": False}
    _cd_roundtrip(tmp_path, "adhr-cdnet", tm, override)


def test_parity_roundtrip_transunet_cd_oracle_f1(tmp_path):
    """transunet-cd round trip (VERDICT r4 item 6). out_channels=128 is the
    only width the reference's own decoder supports (transunet_cd.py:218);
    small ViT dims keep the oracle trainable in test time."""
    ref_mod = _load_ref("models/transunet_cd.py", "ref_tu_rt")
    dims = {"out_channels": 128, "head_num": 4, "mlp_dim": 64, "block_num": 1,
            "patch_dim": 16, "siamese": False}
    tm = ref_mod.TransUNet_CD(
        img_dim=64, in_channels=2, class_num=3, **{
            k: v for k, v in dims.items() if k != "siamese"}, siamese=False,
    )
    override = {"synthetic_size": 8, "synthetic_patch_size": 64,
                "mixed_precision": False, **dims}
    _cd_roundtrip(tmp_path, "transunet-cd", tm, override)


def test_parity_roundtrip_siam_diff_oracle_f1(tmp_path):
    """siam-diff round trip: with this, every parity-CLI method that has an
    importable torch oracle is rehearsed end to end (unet's smp oracle is not
    installable in this image — its converter is structurally pinned in
    test_convert_parity.py::test_smp_unet_converter_structural instead)."""
    ref_mod = _load_ref("models/siam_diff.py", "ref_sd_rt")
    tm = ref_mod.SiamUnet_diff(2, 3)
    override = {"synthetic_size": 8, "synthetic_patch_size": 64, "mixed_precision": False}
    _cd_roundtrip(tmp_path, "siam-diff", tm, override)


def test_parity_roundtrip_siam_conc_oracle_f1(tmp_path):
    """siam-conc round trip (see siam-diff note)."""
    ref_mod = _load_ref("models/siam_conc.py", "ref_sc_rt")
    tm = ref_mod.SiamUnet_conc(2, 3)
    override = {"synthetic_size": 8, "synthetic_patch_size": 64, "mixed_precision": False}
    _cd_roundtrip(tmp_path, "siam-conc", tm, override)


def test_parity_roundtrip_convlstm_oracle_f1(tmp_path):
    """convlstm round trip (VERDICT r4 item 6): the recurrent trainer's
    checkpoint format (recurrent_trainer.py:276-280) through the parity CLI.
    Oracle input is the reference stacking order (pre2, pre1, post) as
    (B, T, C, H, W) — steps.assemble_recurrent_input's contract."""
    import json as _json

    import torch

    ref_mod = _load_ref("models/convlstm.py", "ref_cl_rt")
    tm = ref_mod.ConvLSTM(in_channels=2, num_classes=3, inp_size=64, device="cpu")

    override = {"synthetic_size": 8, "synthetic_patch_size": 64, "mixed_precision": False}

    from kurosiwo_tpu.config import load_config
    from kurosiwo_tpu.data.pipeline import prepare_loaders

    cfg = load_config(
        method="convlstm",
        overrides={"task": "recurrent", "batch_size": 8, **override},
    )
    cfg["mixed_precision"] = False
    train_loader, _, test_loader = prepare_loaders(cfg, seed=999)

    def assemble(batch):
        to_nchw = lambda x: np.asarray(x, np.float32).transpose(0, 3, 1, 2)
        return np.stack([to_nchw(batch["pre2"]), to_nchw(batch["pre1"]),
                         to_nchw(batch["post"])], axis=1)

    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    ce = torch.nn.CrossEntropyLoss(ignore_index=3)
    tm.train()
    for _ in range(10):
        for batch in train_loader:
            x = torch.from_numpy(assemble(batch))
            mask = torch.from_numpy(np.asarray(batch["mask"])).long()
            opt.zero_grad()
            ce(tm(x), mask).backward()
            opt.step()
    tm = tm.eval()
    ckpt = tmp_path / "checkpoint_convlstm.pt"
    torch.save({"epoch": 9, "model_state_dict": tm.state_dict(), "loss": 0.0}, ckpt)

    oracle_f1 = _torch_oracle_f1(tm, test_loader, assemble, two_input=False)

    from kurosiwo_tpu.parity import main

    report = main([
        "--checkpoint", str(ckpt), "--model", "convlstm", "--batch_size", "8",
        "--override", _json.dumps(override),
        "--expected-f1", str(oracle_f1), "--tolerance", "0.5",
    ])
    assert report["f1_within_tolerance"] is True, report
    assert abs(report["delta_f1"]) < 0.5
