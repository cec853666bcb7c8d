"""Numeric parity: reference torch models -> convert.py -> kurosiwo_tpu flax
models must produce matching outputs on identical inputs.

The reference implementation at /root/reference is imported AT TEST TIME as a
behavioral oracle (random-initialized, eval mode). This validates the exact
weight-layout rules the released SNUNet / FloodViT checkpoints will go
through. Skipped when the reference tree is absent.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")


def _load_ref_module(relpath, name):
    spec = importlib.util.spec_from_file_location(name, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch():
    import torch

    torch.manual_seed(0)
    return torch


def test_snunet_parity(torch):
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_snunet
    from kurosiwo_tpu.models.snunet import SNUNetECAM

    ref_mod = _load_ref_module("models/snunet.py", "ref_snunet")
    tm = ref_mod.SNUNet_ECAM(in_channels=2, out_ch=3, base_channel=8).eval()

    x = np.random.RandomState(0).randn(2, 2, 64, 64).astype(np.float32)
    y = np.random.RandomState(1).randn(2, 2, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x), torch.tensor(y)).permute(0, 2, 3, 1).numpy()

    variables = convert_snunet({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    model = SNUNetECAM(num_classes=3, base_channel=8, dtype=jnp.float32)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


def test_floodvit_parity(torch):
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_floodvit
    from kurosiwo_tpu.models.vit import ViT

    ref_mod = _load_ref_module("models/vision_transformer.py", "ref_vit")
    tm = ref_mod.ViT(
        image_size=64, patch_size=16, num_classes=10, dim=64, depth=2,
        heads=4, mlp_dim=128, channels=6, dim_head=16, pool="cls",
    ).eval()

    x = np.random.RandomState(2).randn(2, 6, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x)).numpy()  # (B, N, dim) patch tokens

    variables = convert_floodvit({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    model = ViT(
        image_size=64, patch_size=16, num_classes=10, dim=64, depth=2,
        heads=4, mlp_dim=128, channels=6, dim_head=16, pool="cls", dtype=jnp.float32,
    )
    ours = model.apply({"params": variables["params"]}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


def test_siam_diff_parity(torch):
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_siam
    from kurosiwo_tpu.models.siam import SiamUnetDiff

    ref_mod = _load_ref_module("models/siam_diff.py", "ref_siam_diff")
    tm = ref_mod.SiamUnet_diff(input_nbr=2, label_nbr=3).eval()

    x = np.random.RandomState(3).randn(1, 2, 64, 64).astype(np.float32)
    y = np.random.RandomState(4).randn(1, 2, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x), torch.tensor(y)).permute(0, 2, 3, 1).numpy()

    variables = convert_siam({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    model = SiamUnetDiff(num_classes=3, dtype=jnp.float32)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


def test_siam_conc_parity(torch):
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_siam
    from kurosiwo_tpu.models.siam import SiamUnetConc

    ref_mod = _load_ref_module("models/siam_conc.py", "ref_siam_conc")
    tm = ref_mod.SiamUnet_conc(input_nbr=2, label_nbr=3).eval()

    x = np.random.RandomState(5).randn(1, 2, 64, 64).astype(np.float32)
    y = np.random.RandomState(6).randn(1, 2, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x), torch.tensor(y)).permute(0, 2, 3, 1).numpy()

    variables = convert_siam({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    model = SiamUnetConc(num_classes=3, dtype=jnp.float32)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


def test_bit_cd_resnet_parity(torch):
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_bit_resnet
    from kurosiwo_tpu.models.bit_cd import BiTResNet

    ref_mod = _load_ref_module("models/bit_cd.py", "ref_bit_cd")
    tm = ref_mod.ResNet(input_nc=2, output_nc=3, output_sigmoid=False).eval()

    x = np.random.RandomState(7).randn(1, 2, 64, 64).astype(np.float32)
    y = np.random.RandomState(8).randn(1, 2, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x), torch.tensor(y)).permute(0, 2, 3, 1).numpy()

    variables = convert_bit_resnet({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    model = BiTResNet(num_classes=3, dtype=jnp.float32)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=3e-4)


def test_convlstm_parity(torch):
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_convlstm
    from kurosiwo_tpu.models.convlstm import ConvLSTM

    ref_mod = _load_ref_module("models/convlstm.py", "ref_convlstm")
    tm = ref_mod.ConvLSTM(in_channels=2, num_classes=3, inp_size=32, device="cpu").eval()

    x = np.random.RandomState(9).randn(2, 3, 2, 32, 32).astype(np.float32)  # (B,T,C,H,W)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x)).permute(0, 2, 3, 1).numpy()

    variables = convert_convlstm({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    model = ConvLSTM(num_classes=3, dtype=jnp.float32)
    ours = model.apply(
        {"params": variables["params"]},
        jnp.asarray(x.transpose(0, 1, 3, 4, 2)),  # (B,T,H,W,C)
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


def test_torchvision_resnet_encoder_parity(torch):
    """Plain (non-dilated) resnet18 encoder conversion: features match the
    vendored torchvision-style resnet (same arch as torchvision weights)."""
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_torchvision_resnet, graft_encoder
    from kurosiwo_tpu.models.resnet import ResNetEncoder

    ref_mod = _load_ref_module("models/bit_cd.py", "ref_bit_cd_rn")
    tm = ref_mod.resnet18(3, pretrained=False).eval()

    x = np.random.RandomState(10).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        h = tm.conv1(torch.tensor(x)); h = tm.bn1(h); h = tm.relu(h); h = tm.maxpool(h)
        f1 = tm.layer1(h); f2 = tm.layer2(f1); f3 = tm.layer3(f2); f4 = tm.layer4(f3)
        ref_feats = [t.permute(0, 2, 3, 1).numpy() for t in (f1, f2, f3, f4)]

    variables = convert_torchvision_resnet({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    enc = ResNetEncoder("resnet18", dtype=jnp.float32)
    feats = enc.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    # feats: [input, stem/2, layer1/4, layer2/8, layer3/16, layer4/32]
    for ours, ref in zip(feats[2:], ref_feats):
        np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4)

    # graft into a UNet: encoder params replaced, stem kept (6ch != 3ch)
    from kurosiwo_tpu.models.unet import UNet
    import jax

    model = UNet(num_classes=3, dtype=jnp.float32)
    v0 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)), train=False)
    v1 = graft_encoder(v0, variables)
    k_new = np.asarray(v1["params"]["encoder"]["layer1_0"]["ConvBNAct_0"]["Conv_0"]["kernel"])
    k_ref = np.asarray(variables["params"]["layer1_0"]["ConvBNAct_0"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(k_new, k_ref)
    # stem untouched (channel mismatch)
    np.testing.assert_array_equal(
        np.asarray(v1["params"]["encoder"]["stem"]["Conv_0"]["kernel"]),
        np.asarray(v0["params"]["encoder"]["stem"]["Conv_0"]["kernel"]),
    )
    out = model.apply(v1, jnp.zeros((1, 64, 64, 6)), train=False)
    assert out.shape == (1, 64, 64, 3)


def test_changeformer_parity(torch):
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_changeformer
    from kurosiwo_tpu.models.changeformer import ChangeFormerV6

    # the reference imports timm (absent here) for DropPath/to_2tuple/
    # trunc_normal_ — stub the three symbols before loading it
    import types
    import torch.nn as tnn

    class _DropPath(tnn.Identity):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

    import importlib.machinery

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = _DropPath
    timm_layers.to_2tuple = lambda t: t if isinstance(t, tuple) else (t, t)
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    # a real ModuleSpec on each stub: transformers probes availability via
    # importlib.util.find_spec("timm"), which raises ValueError on a
    # sys.modules entry whose __spec__ is None (test-order dependent crash)
    for _m in (timm, timm_models, timm_layers):
        _m.__spec__ = importlib.machinery.ModuleSpec(_m.__name__, loader=None)
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)

    ref_mod = _load_ref_module("models/changeformer.py", "ref_changeformer")
    tm = ref_mod.ChangeFormerV6(input_nc=2, output_nc=3, decoder_softmax=False,
                                embed_dim=64).eval()

    x = np.random.RandomState(11).randn(1, 2, 64, 64).astype(np.float32)
    y = np.random.RandomState(12).randn(1, 2, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_outs = tm(torch.tensor(x), torch.tensor(y))
        ref_final = ref_outs[-1].permute(0, 2, 3, 1).numpy()

    variables = convert_changeformer({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    model = ChangeFormerV6(embed_dim=64, num_classes=3, decoder_softmax=False, dtype=jnp.float32)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours[-1]), ref_final, atol=5e-4)
    for o_ref, o_ours in zip(ref_outs[:-1], ours[:-1]):
        np.testing.assert_allclose(
            np.asarray(o_ours), o_ref.permute(0, 2, 3, 1).numpy(), atol=5e-4
        )


def test_transunet_cd_parity(torch):
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_transunet_cd
    from kurosiwo_tpu.models.transunet_cd import TransUNetCD

    ref_mod = _load_ref_module("models/transunet_cd.py", "ref_transunet")
    # out_channels must be 128: the reference hardcodes the 512-ch ViT
    # bottleneck, so other widths break its own decoder (transunet_cd.py:218)
    tm = ref_mod.TransUNet_CD(
        img_dim=64, in_channels=2, out_channels=128, head_num=4, mlp_dim=64,
        block_num=1, patch_dim=16, class_num=3, siamese=False,
    ).eval()

    x = np.random.RandomState(13).randn(1, 2, 64, 64).astype(np.float32)
    y = np.random.RandomState(14).randn(1, 2, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x), torch.tensor(y)).permute(0, 2, 3, 1).numpy()

    variables = convert_transunet_cd({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    model = TransUNetCD(out_channels=128, head_num=4, mlp_dim=64, block_num=1,
                        patch_dim=16, num_classes=3, siamese=False, dtype=jnp.float32)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-4)


def test_hfanet_parity(torch):
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_hfanet
    from kurosiwo_tpu.models.hfanet import HFANet

    ref_mod = _load_ref_module("models/hfanet.py", "ref_hfanet")
    tm = ref_mod.HFANet(input_channel=2, input_size=224, num_classes=3).eval()

    x = np.random.RandomState(15).randn(1, 2, 224, 224).astype(np.float32)
    y = np.random.RandomState(16).randn(1, 2, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x), torch.tensor(y)).permute(0, 2, 3, 1).numpy()

    variables = convert_hfanet({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    model = HFANet(num_classes=3, dtype=jnp.float32)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-4)


def test_adhr_cdnet_parity(torch):
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_adhr
    from kurosiwo_tpu.models.adhr_cdnet import ADHR

    ref_mod = _load_ref_module("models/adhr_cdnet.py", "ref_adhr")
    tm = ref_mod.ADHR(2, 3).eval()

    x = np.random.RandomState(0).randn(1, 2, 64, 64).astype(np.float32)
    y = np.random.RandomState(1).randn(1, 2, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x), torch.tensor(y)).permute(0, 2, 3, 1).numpy()

    variables = convert_adhr({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    model = ADHR(num_classes=3, dtype=jnp.float32)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-4)


def test_bit_transformer_parity(torch):
    """All three BASE_Transformer define_G variants (bit_cd.py:690-701)."""
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_bit_transformer
    from kurosiwo_tpu.models.bit_cd import build_bit_cd

    ref_mod = _load_ref_module("models/bit_cd.py", "ref_bit")
    for net_g in (
        "base_transformer_pos_s4",
        "base_transformer_pos_s4_dd8",
        "base_transformer_pos_s4_dd8_dedim8",
    ):
        tm = ref_mod.define_G(
            {"net_G": net_g, "init_type": "normal", "init_gain": 0.02}, in_channels=2
        ).eval()
        x = np.random.RandomState(0).randn(1, 2, 64, 64).astype(np.float32)
        y = np.random.RandomState(1).randn(1, 2, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref_out = tm(torch.tensor(x), torch.tensor(y)).permute(0, 2, 3, 1).numpy()

        variables = convert_bit_transformer(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        )
        model = build_bit_cd({"net_G": net_g}, num_classes=3, dtype=jnp.float32)
        ours = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(y.transpose(0, 2, 3, 1)),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-4, err_msg=net_g)


def test_upernet_convnext_parity(torch):
    """HF UperNetForSemanticSegmentation (ConvNext backbone) — the exact
    model class the reference loads from_pretrained (upernet.py:28-77) —
    constructed locally with a small random config (zero-egress env)."""
    import jax.numpy as jnp
    from transformers import ConvNextConfig, UperNetConfig, UperNetForSemanticSegmentation

    from kurosiwo_tpu.convert import convert_upernet
    from kurosiwo_tpu.models.upernet import UperNet

    bc = ConvNextConfig(
        num_channels=2, hidden_sizes=[16, 32, 64, 128], depths=[1, 1, 2, 1],
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    cfg = UperNetConfig(backbone_config=bc, hidden_size=32, num_labels=3)
    tm = UperNetForSemanticSegmentation(cfg).eval()

    x = np.random.RandomState(0).randn(1, 2, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x)).logits.permute(0, 2, 3, 1).numpy()

    variables = convert_upernet({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    model = UperNet(
        num_classes=3, backbone="convnext_custom", channels=32, dtype=jnp.float32,
        backbone_spec=((1, 1, 2, 1), (16, 32, 64, 128)),
    )
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    # 1e-3 (not the zoo-wide 5e-4): XLA-CPU oneDNN conv algorithm choice
    # varies run-to-run and the deep FPN amplifies it past 5e-4 marginally
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-3)


def test_upernet_swin_parity(torch):
    import jax.numpy as jnp
    from transformers import SwinConfig, UperNetConfig, UperNetForSemanticSegmentation

    from kurosiwo_tpu.convert import convert_upernet
    from kurosiwo_tpu.models.upernet import UperNet

    bc = SwinConfig(
        num_channels=2, embed_dim=16, depths=[1, 1, 2, 1], num_heads=[1, 2, 4, 8],
        window_size=7, image_size=224,
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    cfg = UperNetConfig(backbone_config=bc, hidden_size=32, num_labels=3)
    tm = UperNetForSemanticSegmentation(cfg).eval()

    # 224 so every stage is window-aligned (56/28/14/7 with ws=7)
    x = np.random.RandomState(1).randn(1, 2, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x)).logits.permute(0, 2, 3, 1).numpy()

    variables = convert_upernet({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    model = UperNet(
        num_classes=3, backbone="swin_custom", channels=32, dtype=jnp.float32,
        backbone_spec=((1, 1, 2, 1), 16, (1, 2, 4, 8)),
    )
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-3)


def test_smp_unet_converter_structural(torch):
    """smp.Unet checkpoint conversion — structural round trip.

    segmentation_models_pytorch is not installed in this image, so unlike
    the live-oracle tests above this builds a synthetic state dict with the
    exact smp 0.3.x key schema/shapes, converts, and requires (a) every
    model variable to be covered with matching shapes and (b) a live
    forward pass. Kernel-transpose rules are shared with the live-oracle
    converters (conv_kernel/_convert_bn)."""
    import jax
    import jax.numpy as jnp

    from kurosiwo_tpu.convert import convert_smp_unet
    from kurosiwo_tpu.models.unet import UNet

    rs = np.random.RandomState(11)
    sd = {}

    def conv(key, cout, cin, k=3, bias=False):
        sd[f"{key}.weight"] = rs.randn(cout, cin, k, k).astype(np.float32) * 0.05
        if bias:
            sd[f"{key}.bias"] = rs.randn(cout).astype(np.float32) * 0.05

    def bn(key, c):
        sd[f"{key}.weight"] = rs.rand(c).astype(np.float32) + 0.5
        sd[f"{key}.bias"] = rs.randn(c).astype(np.float32) * 0.05
        sd[f"{key}.running_mean"] = rs.randn(c).astype(np.float32) * 0.05
        sd[f"{key}.running_var"] = rs.rand(c).astype(np.float32) + 0.5

    # encoder: torchvision resnet18 with 6 input channels
    conv("encoder.conv1", 64, 6, 7)
    bn("encoder.bn1", 64)
    widths = {1: 64, 2: 128, 3: 256, 4: 512}
    for s in (1, 2, 3, 4):
        for i in (0, 1):
            cin = widths[s] if (i == 1 or s == 1) else widths[s - 1]
            conv(f"encoder.layer{s}.{i}.conv1", widths[s], cin)
            bn(f"encoder.layer{s}.{i}.bn1", widths[s])
            conv(f"encoder.layer{s}.{i}.conv2", widths[s], widths[s])
            bn(f"encoder.layer{s}.{i}.bn2", widths[s])
            if s > 1 and i == 0:
                conv(f"encoder.layer{s}.{i}.downsample.0", widths[s], widths[s - 1], 1)
                bn(f"encoder.layer{s}.{i}.downsample.1", widths[s])
    # decoder: smp default channels, conv1 over cat(up, skip)
    dec = [(512 + 256, 256), (256 + 128, 128), (128 + 64, 64), (64 + 64, 32), (32, 16)]
    for i, (cin, cout) in enumerate(dec):
        conv(f"decoder.blocks.{i}.conv1.0", cout, cin)
        bn(f"decoder.blocks.{i}.conv1.1", cout)
        conv(f"decoder.blocks.{i}.conv2.0", cout, cout)
        bn(f"decoder.blocks.{i}.conv2.1", cout)
    conv("segmentation_head.0", 3, 16, 3, bias=True)

    variables = convert_smp_unet(sd)
    model = UNet(num_classes=3, backbone="resnet18", dtype=jnp.float32)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)), train=False)
    # full coverage with matching shapes, both collections
    for coll in ("params", "batch_stats"):
        a = jax.tree_util.tree_leaves_with_path(ref[coll])
        b = jax.tree_util.tree_leaves_with_path(variables[coll])
        pa = {jax.tree_util.keystr(k): v.shape for k, v in a}
        pb = {jax.tree_util.keystr(k): np.shape(v) for k, v in b}
        assert pa == pb, set(pa.items()) ^ set(pb.items())
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(rs.randn(1, 64, 64, 6).astype(np.float32)), train=False,
    )
    assert np.isfinite(np.asarray(out)).all() and out.shape == (1, 64, 64, 3)


def test_graft_encoder_matching_stem_and_bn_stats(torch):
    """3-channel inputs: the stem conv IS grafted (the old leaves-order guard
    compared a BN bias against the kernel and always skipped it); mismatched
    stems keep their INIT running stats, not imagenet's."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kurosiwo_tpu.convert import convert_torchvision_resnet, graft_encoder
    from kurosiwo_tpu.models.unet import UNet

    ref_mod = _load_ref_module("models/bit_cd.py", "ref_bit_cd_rn")
    tm = ref_mod.resnet18(3, pretrained=False).eval()
    variables = convert_torchvision_resnet({k: v.detach().numpy() for k, v in tm.state_dict().items()})

    model3 = UNet(num_classes=3, dtype=jnp.float32)
    v0 = model3.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    v1 = graft_encoder(v0, variables)
    np.testing.assert_array_equal(
        np.asarray(v1["params"]["encoder"]["stem"]["Conv_0"]["kernel"]),
        np.asarray(variables["params"]["stem"]["Conv_0"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(v1["batch_stats"]["encoder"]["stem"]["BatchNorm_0"]["mean"]),
        np.asarray(variables["batch_stats"]["stem"]["BatchNorm_0"]["mean"]),
    )

    model6 = UNet(num_classes=3, dtype=jnp.float32)
    v6 = model6.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)), train=False)
    g6 = graft_encoder(v6, variables)
    # random stem keeps its INIT stats (zeros mean)
    np.testing.assert_array_equal(
        np.asarray(g6["batch_stats"]["encoder"]["stem"]["BatchNorm_0"]["mean"]),
        np.asarray(v6["batch_stats"]["encoder"]["stem"]["BatchNorm_0"]["mean"]),
    )
