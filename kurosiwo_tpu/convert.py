"""torch -> JAX checkpoint converter for the released Kuro Siwo artifacts.

Parity targets (reference README.md:64-67): `best_segmentation.pt` (SNUNet,
saved as a WHOLE pickled torch module by segmentation_trainer.py:255) and
`floodvit.pt` (MAE-pretrained ViT encoder, train_mae.py:204-232). This module
maps their state dicts onto the kurosiwo_tpu flax variable trees.

Layout rules (torch -> flax/NHWC):
  Conv2d            (O, I, kh, kw)  -> kernel (kh, kw, I, O)
  ConvTranspose2d   (I, O, kh, kw)  -> TorchConvTranspose kernel (kh, kw, O, I)
  Linear            (O, I)          -> Dense kernel (I, O)
  BatchNorm2d       weight/bias/running_mean/running_var
                    -> scale/bias (params) + mean/var (batch_stats)
  LayerNorm         weight/bias     -> scale/bias

torch is used ONLY here (host-side, one-shot conversion) — never on any
runtime path.
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint: handles raw state dicts, trainer-style
    {'model_state_dict': ...} wrappers, and whole pickled modules."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    elif isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    # torch (I, O, kh, kw) -> TorchConvTranspose (kh, kw, O, I)
    return np.transpose(w, (2, 3, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_conv(params, prefix: tuple, sd, key):
    _set(params, prefix + ("kernel",), conv_kernel(sd[f"{key}.weight"]))
    if f"{key}.bias" in sd:
        _set(params, prefix + ("bias",), sd[f"{key}.bias"])


def _convert_tconv(params, prefix: tuple, sd, key):
    _set(params, prefix + ("kernel",), conv_transpose_kernel(sd[f"{key}.weight"]))
    if f"{key}.bias" in sd:
        _set(params, prefix + ("bias",), sd[f"{key}.bias"])


def _convert_bn(params, batch_stats, prefix: tuple, sd, key):
    _set(params, prefix + ("scale",), sd[f"{key}.weight"])
    _set(params, prefix + ("bias",), sd[f"{key}.bias"])
    _set(batch_stats, prefix + ("mean",), sd[f"{key}.running_mean"])
    _set(batch_stats, prefix + ("var",), sd[f"{key}.running_var"])


def _convert_dense(params, prefix: tuple, sd, key):
    _set(params, prefix + ("kernel",), dense_kernel(sd[f"{key}.weight"]))
    if f"{key}.bias" in sd:
        _set(params, prefix + ("bias",), sd[f"{key}.bias"])


def _convert_ln(params, prefix: tuple, sd, key):
    _set(params, prefix + ("scale",), sd[f"{key}.weight"])
    _set(params, prefix + ("bias",), sd[f"{key}.bias"])


# ---------------------------------------------------------------------------
# SNUNet (reference models/snunet.py <-> kurosiwo_tpu/models/snunet.py)
# ---------------------------------------------------------------------------

def convert_snunet(sd: dict[str, np.ndarray]) -> dict:
    """state_dict of SNUNet_ECAM -> {'params': ..., 'batch_stats': ...}."""
    params: dict = {}
    bstats: dict = {}
    blocks = [k.split(".")[0] for k in sd.keys()]
    conv_blocks = sorted({b for b in blocks if re.fullmatch(r"conv\d_\d", b)})
    for b in conv_blocks:
        _convert_conv(params, (b, "conv1"), sd, f"{b}.conv1")
        _convert_bn(params, bstats, (b, "bn1"), sd, f"{b}.bn1")
        _convert_conv(params, (b, "conv2"), sd, f"{b}.conv2")
        _convert_bn(params, bstats, (b, "bn2"), sd, f"{b}.bn2")
    up_blocks = sorted({b for b in blocks if re.fullmatch(r"Up\d_\d", b)})
    for b in up_blocks:
        _convert_tconv(params, (b, "up"), sd, f"{b}.up")
    for ca in ("ca", "ca1"):
        _convert_conv(params, (ca, "fc1"), sd, f"{ca}.fc1")
        _convert_conv(params, (ca, "fc2"), sd, f"{ca}.fc2")
    _convert_conv(params, ("conv_final",), sd, "conv_final")
    return {"params": params, "batch_stats": bstats}


# ---------------------------------------------------------------------------
# FloodViT (reference models/vision_transformer.py <-> models/vit.py)
# ---------------------------------------------------------------------------

def convert_floodvit(sd: dict[str, np.ndarray]) -> dict:
    """state_dict of the lucidrains-style ViT -> {'params': ...}.

    Reference module names (vision_transformer.py):
      to_patch_embedding.1 (LN), .2 (Linear), .3 (LN); pos_embedding;
      cls_token; transformer.layers.{i}.0 = Attention (norm, to_qkv,
      to_out.0), .1 = FeedForward (net.0 LN, net.1 fc1, net.4 fc2);
      transformer.norm; mlp_head.
    """
    params: dict = {}
    _convert_ln(params, ("patch_norm1",), sd, "to_patch_embedding.1")
    _convert_dense(params, ("patch_proj",), sd, "to_patch_embedding.2")
    _convert_ln(params, ("patch_norm2",), sd, "to_patch_embedding.3")
    _set(params, ("pos_embedding",), sd["pos_embedding"])
    _set(params, ("cls_token",), sd["cls_token"])
    depth = 0
    while f"transformer.layers.{depth}.0.to_qkv.weight" in sd:
        i = depth
        base = f"transformer.layers.{i}"
        _convert_ln(params, ("transformer", f"attn_{i}", "norm"), sd, f"{base}.0.norm")
        _convert_dense(params, ("transformer", f"attn_{i}", "to_qkv"), sd, f"{base}.0.to_qkv")
        _convert_dense(params, ("transformer", f"attn_{i}", "to_out"), sd, f"{base}.0.to_out.0")
        _convert_ln(params, ("transformer", f"ff_{i}", "norm"), sd, f"{base}.1.net.0")
        _convert_dense(params, ("transformer", f"ff_{i}", "fc1"), sd, f"{base}.1.net.1")
        _convert_dense(params, ("transformer", f"ff_{i}", "fc2"), sd, f"{base}.1.net.4")
        depth += 1
    _convert_ln(params, ("transformer", "norm"), sd, "transformer.norm")
    if "mlp_head.weight" in sd:
        _convert_dense(params, ("mlp_head",), sd, "mlp_head")
    return {"params": params}


# ---------------------------------------------------------------------------
# Siamese UNets (reference models/siam_diff.py / siam_conc.py <-> models/siam.py)
# ---------------------------------------------------------------------------

_SIAM_ENC = [
    ("c11", "11"), ("c12", "12"), ("c21", "21"), ("c22", "22"),
    ("c31", "31"), ("c32", "32"), ("c33", "33"),
    ("c41", "41"), ("c42", "42"), ("c43", "43"),
]
_SIAM_DEC = [
    # (our stage module, torch suffix)
    ("dec4_0", "43d"), ("dec4_1", "42d"), ("dec4_2", "41d"),
    ("dec3_0", "33d"), ("dec3_1", "32d"), ("dec3_2", "31d"),
    ("dec2_0", "22d"), ("dec2_1", "21d"),
    ("dec1_0", "12d"),
]


def convert_siam(sd: dict[str, np.ndarray]) -> dict:
    params: dict = {}
    bstats: dict = {}
    for ours, theirs in _SIAM_ENC:
        _convert_conv(params, ("encoder", ours, "conv"), sd, f"conv{theirs}")
        _convert_bn(params, bstats, ("encoder", ours, "bn"), sd, f"bn{theirs}")
    for i in (4, 3, 2, 1):
        _convert_tconv(params, (f"upconv{i}",), sd, f"upconv{i}")
    for ours, theirs in _SIAM_DEC:
        _convert_tconv(params, (ours, "conv"), sd, f"conv{theirs}")
        _convert_bn(params, bstats, (ours, "bn"), sd, f"bn{theirs}")
    _convert_tconv(params, ("classifier",), sd, "conv11d")
    return {"params": params, "batch_stats": bstats}


# ---------------------------------------------------------------------------
# BiT-CD base_resnet18 (reference models/bit_cd.py ResNet <-> models/bit_cd.py)
# ---------------------------------------------------------------------------

def convert_bit_resnet(sd: dict[str, np.ndarray]) -> dict:
    """state_dict of bit_cd.ResNet (net_G='base_resnet18', the shipped
    config) -> BiTResNet variables. Maps the vendored torchvision resnet18
    names onto ResNetEncoder's auto-named ConvBNAct children."""
    params: dict = {}
    bstats: dict = {}
    rn = ("backbone", "resnet")
    _convert_conv(params, rn + ("stem", "Conv_0"), sd, "resnet.conv1")
    _convert_bn(params, bstats, rn + ("stem", "BatchNorm_0"), sd, "resnet.bn1")
    for s in (1, 2, 3, 4):
        i = 0
        while f"resnet.layer{s}.{i}.conv1.weight" in sd:
            t = f"resnet.layer{s}.{i}"
            m = rn + (f"layer{s}_{i}",)
            _convert_conv(params, m + ("ConvBNAct_0", "Conv_0"), sd, f"{t}.conv1")
            _convert_bn(params, bstats, m + ("ConvBNAct_0", "BatchNorm_0"), sd, f"{t}.bn1")
            _convert_conv(params, m + ("ConvBNAct_1", "Conv_0"), sd, f"{t}.conv2")
            _convert_bn(params, bstats, m + ("ConvBNAct_1", "BatchNorm_0"), sd, f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                _convert_conv(params, m + ("ConvBNAct_2", "Conv_0"), sd, f"{t}.downsample.0")
                _convert_bn(params, bstats, m + ("ConvBNAct_2", "BatchNorm_0"), sd, f"{t}.downsample.1")
            i += 1
    _convert_conv(params, ("backbone", "conv_pred"), sd, "conv_pred")
    _convert_conv(params, ("classifier", "ConvBNAct_0", "Conv_0"), sd, "classifier.0")
    _convert_bn(params, bstats, ("classifier", "ConvBNAct_0", "BatchNorm_0"), sd, "classifier.1")
    _convert_conv(params, ("classifier", "Conv_0"), sd, "classifier.3")
    return {"params": params, "batch_stats": bstats}


# ---------------------------------------------------------------------------
# torchvision-style ResNet encoders (pretrained-imagenet path for UNet /
# UNet++ / DeepLabv3+ — the reference gets these via smp's encoder zoo)
# ---------------------------------------------------------------------------

def convert_torchvision_resnet(sd: dict[str, np.ndarray], prefix: str = "") -> dict:
    """torchvision resnet{18,34,50} state dict -> ResNetEncoder variables.
    `prefix` strips a leading module path (e.g. 'resnet.' for bit_cd)."""
    params: dict = {}
    bstats: dict = {}
    key = lambda k: f"{prefix}{k}"
    _convert_conv(params, ("stem", "Conv_0"), sd, key("conv1"))
    _convert_bn(params, bstats, ("stem", "BatchNorm_0"), sd, key("bn1"))
    for s in (1, 2, 3, 4):
        i = 0
        while f"{prefix}layer{s}.{i}.conv1.weight" in sd:
            t = key(f"layer{s}.{i}")
            m = (f"layer{s}_{i}",)
            n_convs = 3 if f"{t}.conv3.weight" in sd else 2  # bottleneck vs basic
            for ci in range(n_convs):
                _convert_conv(params, m + (f"ConvBNAct_{ci}", "Conv_0"), sd, f"{t}.conv{ci + 1}")
                _convert_bn(params, bstats, m + (f"ConvBNAct_{ci}", "BatchNorm_0"), sd, f"{t}.bn{ci + 1}")
            if f"{t}.downsample.0.weight" in sd:
                ds = n_convs  # downsample follows the main convs in my naming
                _convert_conv(params, m + (f"ConvBNAct_{ds}", "Conv_0"), sd, f"{t}.downsample.0")
                _convert_bn(params, bstats, m + (f"ConvBNAct_{ds}", "BatchNorm_0"), sd, f"{t}.downsample.1")
            i += 1
    return {"params": params, "batch_stats": bstats}


def graft_encoder(variables: dict, encoder_vars: dict, encoder_name: str = "encoder") -> dict:
    """Replace the encoder subtree of an initialized model's variables with
    converted pretrained weights; shapes must match except the stem's input
    channels (SAR channel counts differ from imagenet's 3 — the stem conv is
    kept at its random init in that case, like smp's first-conv patching)."""
    out_params = dict(variables["params"])
    enc = dict(out_params[encoder_name])
    new_enc_params = encoder_vars["params"]
    stem_grafted = True
    for k, v in new_enc_params.items():
        if k == "stem":
            # compare the CONV KERNELS by explicit path — tree.leaves order
            # is alphabetical (BatchNorm bias first), which once made this
            # guard compare a (64,) BN bias against the (7,7,C,64) kernel
            # and skip the stem even for matching 3-channel inputs
            old_kernel = enc["stem"]["Conv_0"]["kernel"]
            new_kernel = v["Conv_0"]["kernel"]
            if old_kernel.shape != new_kernel.shape:
                stem_grafted = False
                continue  # keep random stem for non-3-channel inputs
        enc[k] = v
    out_params[encoder_name] = enc
    out = dict(variables)
    out["params"] = out_params
    bs = dict(variables.get("batch_stats", {}))
    if encoder_vars.get("batch_stats"):
        enc_bs = dict(bs.get(encoder_name, {}))
        new_bs = dict(encoder_vars["batch_stats"])
        if not stem_grafted:
            # a random-init stem must keep its init running stats — imagenet
            # mean/var would mis-normalize the random conv's activations at
            # eval (use_running_average)
            new_bs.pop("stem", None)
        enc_bs.update(new_bs)
        bs[encoder_name] = enc_bs
        out["batch_stats"] = bs
    return out


# ---------------------------------------------------------------------------
# ConvLSTM (reference models/convlstm.py <-> kurosiwo_tpu/models/convlstm.py)
# ---------------------------------------------------------------------------

def _convert_gn(params, prefix: tuple, sd, key):
    _set(params, prefix + ("scale",), sd[f"{key}.weight"])
    _set(params, prefix + ("bias",), sd[f"{key}.bias"])


def convert_convlstm(sd: dict[str, np.ndarray]) -> dict:
    """state_dict of the reference ConvLSTM -> flax variables. Cell convs are
    Sequential(conv, GroupNorm) -> {cell}/conv + {cell}/norm; encoder strided
    convs keep their names; only transconv_3d reaches the output (the
    reference's transconv_1d/2d are dead compute, see models/convlstm.py)."""
    params: dict = {}
    for enc in ("conv_1e", "conv_2e", "conv_3e"):
        _convert_conv(params, (enc,), sd, enc)
    for cell in ("clstm_1e", "clstm_2e", "clstm_3e", "clstm_1d", "clstm_2d", "clstm_3d"):
        _convert_conv(params, (cell, "conv"), sd, f"{cell}.conv.0")
        _convert_gn(params, (cell, "norm"), sd, f"{cell}.conv.1")
    _convert_tconv(params, ("transconv_3d",), sd, "transconv_3d")
    return {"params": params}


# ---------------------------------------------------------------------------
# TransUNet-CD (reference models/transunet_cd.py <-> models/transunet_cd.py)
# ---------------------------------------------------------------------------

def _convert_convbn_folded(params, bstats, prefix: tuple, sd, conv_key, bn_key):
    """Conv(+bias) -> BN mapped onto a bias-free ConvBNAct: the conv bias is
    folded into the BN running mean (BN(x + b) == BN' (x) with
    mean' = mean - b — exact)."""
    _set(params, prefix + ("Conv_0", "kernel"), conv_kernel(sd[f"{conv_key}.weight"]))
    mean = sd[f"{bn_key}.running_mean"]
    if f"{conv_key}.bias" in sd:
        mean = mean - sd[f"{conv_key}.bias"]
    _set(params, prefix + ("BatchNorm_0", "scale"), sd[f"{bn_key}.weight"])
    _set(params, prefix + ("BatchNorm_0", "bias"), sd[f"{bn_key}.bias"])
    _set(bstats, prefix + ("BatchNorm_0", "mean"), mean)
    _set(bstats, prefix + ("BatchNorm_0", "var"), sd[f"{bn_key}.running_var"])


def _convert_transunet_encoder(params, bstats, sd, t: str, m: str):
    _convert_convbn_folded(params, bstats, (m, "conv1"), sd, f"{t}.conv1", f"{t}.norm1")
    for k in (1, 2, 3):
        b = f"{t}.encoder{k}"
        mb = (m, f"encoder{k}")
        _convert_convbn_folded(params, bstats, mb + ("downsample",), sd, f"{b}.downsample.0", f"{b}.downsample.1")
        for ci in (1, 2, 3):
            _convert_convbn_folded(params, bstats, mb + (f"conv{ci}",), sd, f"{b}.conv{ci}", f"{b}.norm{ci}")
    vt = f"{t}.vit"
    mv = (m, "vit")
    _convert_dense(params, mv + ("projection",), sd, f"{vt}.projection")
    _set(params, mv + ("embedding",), sd[f"{vt}.embedding"])
    _set(params, mv + ("cls_token",), sd[f"{vt}.cls_token"])
    i = 0
    while f"{vt}.transformer.layer_blocks.{i}.layer_norm1.weight" in sd:
        tb = f"{vt}.transformer.layer_blocks.{i}"
        mb = mv + (f"block_{i}",)
        _convert_dense(params, mb + ("qkv",), sd, f"{tb}.multi_head_attention.qkv_layer")
        _convert_dense(params, mb + ("out_attention",), sd, f"{tb}.multi_head_attention.out_attention")
        _convert_ln(params, mb + ("norm1",), sd, f"{tb}.layer_norm1")
        _convert_ln(params, mb + ("norm2",), sd, f"{tb}.layer_norm2")
        _convert_dense(params, mb + ("fc1",), sd, f"{tb}.mlp.mlp_layers.0")
        _convert_dense(params, mb + ("fc2",), sd, f"{tb}.mlp.mlp_layers.3")
        i += 1
    _convert_convbn_folded(params, bstats, (m, "conv2"), sd, f"{t}.conv2", f"{t}.norm2")


def convert_transunet_cd(sd: dict[str, np.ndarray]) -> dict:
    params: dict = {}
    bstats: dict = {}
    siamese = "encoder.conv1.weight" in sd
    if siamese:
        _convert_transunet_encoder(params, bstats, sd, "encoder", "encoder")
    else:
        _convert_transunet_encoder(params, bstats, sd, "encoder1", "encoder1")
        _convert_transunet_encoder(params, bstats, sd, "encoder2", "encoder2")
    for k in (1, 2, 3, 4):
        d = f"decoder.decoder{k}"
        mb = (f"decoder{k}",)
        _convert_convbn_folded(params, bstats, mb + ("conv1",), sd, f"{d}.layer.0", f"{d}.layer.1")
        _convert_convbn_folded(params, bstats, mb + ("conv2",), sd, f"{d}.layer.3", f"{d}.layer.4")
    _convert_conv(params, ("head",), sd, "decoder.conv1")
    return {"params": params, "batch_stats": bstats}


# ---------------------------------------------------------------------------
# HFA-Net (reference models/hfanet.py <-> kurosiwo_tpu/models/hfanet.py)
# ---------------------------------------------------------------------------

def _convert_prelu(params, prefix: tuple, sd, key):
    _set(params, prefix + ("alpha",), sd[f"{key}.weight"])


def _convert_cbp(params, bstats, prefix: tuple, sd, conv_key, bn_key, prelu_key):
    """ConvBNPReLU: conv(+bias) -> BN -> PReLU."""
    _set(params, prefix + ("Conv_0", "kernel"), conv_kernel(sd[f"{conv_key}.weight"]))
    if f"{conv_key}.bias" in sd:
        _set(params, prefix + ("Conv_0", "bias"), sd[f"{conv_key}.bias"])
    _convert_bn(params, bstats, prefix + ("BatchNorm_0",), sd, bn_key)
    _convert_prelu(params, prefix + ("PReLU_0",), sd, prelu_key)


def _convert_hfa_sa(params, bstats, prefix: tuple, sd, t: str):
    """SpatialAttentionStage: mini-UNet -> sigmoid mask."""
    order = [
        ("ConvBNPReLU_0", "conv1_1", "bn1_1", "ReLU1_1"),
        ("ConvBNPReLU_1", "conv1_2", "bn1_2", "ReLU1_2"),
        ("ConvBNPReLU_2", "conv2_1", "bn2_1", "ReLU2_1"),
        ("ConvBNPReLU_3", "conv2_2", "bn2_2", "ReLU2_2"),
        ("ConvBNPReLU_4", "conv_b_1", "bn_b_1", "ReLU_b_1"),
        ("ConvBNPReLU_5", "conv_b_2", "bn_b_2", "ReLU_b_2"),
        ("ConvBNPReLU_6", "conv3_1", "bn3_1", "ReLU3_1"),
        ("ConvBNPReLU_7", "conv3_2", "bn3_2", "ReLU3_2"),
        ("ConvBNPReLU_8", "conv4_1", "bn4_1", "ReLU4_1"),
        ("ConvBNPReLU_9", "conv4_2", "bn4_2", "ReLU4_2"),
        ("ConvBNPReLU_10", "conv5_1", "bn5_1", "ReLU5_1"),
    ]
    for mine, ck, bk, pk in order:
        _convert_cbp(params, bstats, prefix + (mine,), sd, f"{t}.{ck}", f"{t}.{bk}", f"{t}.{pk}")
    _convert_tconv(params, prefix + ("TorchConvTranspose_0",), sd, f"{t}.convtrans_1")
    _convert_tconv(params, prefix + ("TorchConvTranspose_1",), sd, f"{t}.convtrans_2")
    _convert_conv(params, prefix + ("Conv_0",), sd, f"{t}.conv5_2")
    _convert_bn(params, bstats, prefix + ("BatchNorm_0",), sd, f"{t}.bn5_2")


def _convert_hfab(params, bstats, prefix: tuple, sd, t: str):
    _convert_hfa_sa(params, bstats, prefix + ("sa",), sd, f"{t}.SA")
    hf = f"{t}.HF"
    _convert_dense(params, prefix + ("hf", "fc1"), sd, f"{hf}.FC_1")
    _convert_prelu(params, prefix + ("hf", "PReLU_0"), sd, f"{hf}.ReLU")
    _convert_dense(params, prefix + ("hf", "fc2"), sd, f"{hf}.FC_2")
    _convert_conv(params, prefix + ("hf", "fusion"), sd, f"{hf}.Channelfusion")


def convert_hfanet(sd: dict[str, np.ndarray]) -> dict:
    params: dict = {}
    bstats: dict = {}
    enc = ("encoder",)
    _convert_conv(params, enc + ("pre_treat",), sd, "encoder._pre_treat_2")
    # _layer_i = Sequential(HFAB, Conv, BN, PReLU, HFAB, Conv, BN, PReLU)
    for i in range(1, 6):
        t = f"encoder._layer_{i}"
        m = enc + (f"layer_{i}",)
        _convert_hfab(params, bstats, m + ("hfab1",), sd, f"{t}.0")
        _convert_cbp(params, bstats, m + ("conv1",), sd, f"{t}.1", f"{t}.2", f"{t}.3")
        _convert_hfab(params, bstats, m + ("hfab2",), sd, f"{t}.4")
        _convert_cbp(params, bstats, m + ("conv2",), sd, f"{t}.5", f"{t}.6", f"{t}.7")
    for i in range(1, 5):
        _convert_conv(params, (f"skip_fusion_{i}",), sd, f"skip_connection_feature_fusion_{i}")
    _convert_conv(params, ("bottom_fusion",), sd, "bottom_feature_fusion")
    # decoder: _up_sample_i = Sequential(conv1x1, Upsample); _up_layer_i =
    # Sequential(Conv, BN, PReLU, HFAB, Conv, BN, PReLU, HFAB)
    for i in range(1, 5):
        t = f"decoder._up_sample_{i}"
        m = (f"up_{i}",)
        _convert_conv(params, m + ("reduce",), sd, f"{t}.0")
        tl = f"decoder._up_layer_{i}"
        _convert_cbp(params, bstats, m + ("conv1",), sd, f"{tl}.0", f"{tl}.1", f"{tl}.2")
        _convert_hfab(params, bstats, m + ("hfab1",), sd, f"{tl}.3")
        _convert_cbp(params, bstats, m + ("conv2",), sd, f"{tl}.4", f"{tl}.5", f"{tl}.6")
        _convert_hfab(params, bstats, m + ("hfab2",), sd, f"{tl}.7")
    # out layer: Sequential(Conv, BN, PReLU, Conv, BN, PReLU, Conv1x1)
    t = "decoder._out_layer"
    _convert_cbp(params, bstats, ("out1",), sd, f"{t}.0", f"{t}.1", f"{t}.2")
    _convert_cbp(params, bstats, ("out2",), sd, f"{t}.3", f"{t}.4", f"{t}.5")
    _convert_conv(params, ("head",), sd, f"{t}.6")
    return {"params": params, "batch_stats": bstats}


# ---------------------------------------------------------------------------
# ChangeFormerV6 (reference models/changeformer.py <-> models/changeformer.py)
# ---------------------------------------------------------------------------

_CF_DEPTHS = (3, 3, 4, 3)


def convert_changeformer(sd: dict[str, np.ndarray]) -> dict:
    """state_dict of ChangeFormerV6 -> flax variables."""
    params: dict = {}
    bstats: dict = {}
    enc = ("Tenc_x2",)
    for s in range(1, 5):
        pe = f"Tenc_x2.patch_embed{s}"
        _convert_conv(params, enc + (f"patch_embed{s}", "proj"), sd, f"{pe}.proj")
        _convert_ln(params, enc + (f"patch_embed{s}", "norm"), sd, f"{pe}.norm")
        i = 0
        while f"Tenc_x2.block{s}.{i}.norm1.weight" in sd:  # probe depth like the other converters
            tb = f"Tenc_x2.block{s}.{i}"
            mb = enc + (f"block{s}_{i}",)
            _convert_ln(params, mb + ("norm1",), sd, f"{tb}.norm1")
            _convert_dense(params, mb + ("attn", "q"), sd, f"{tb}.attn.q")
            _convert_dense(params, mb + ("attn", "kv"), sd, f"{tb}.attn.kv")
            if f"{tb}.attn.sr.weight" in sd:
                _convert_conv(params, mb + ("attn", "sr"), sd, f"{tb}.attn.sr")
                _convert_ln(params, mb + ("attn", "norm"), sd, f"{tb}.attn.norm")
            _convert_dense(params, mb + ("attn", "proj"), sd, f"{tb}.attn.proj")
            _convert_ln(params, mb + ("norm2",), sd, f"{tb}.norm2")
            _convert_dense(params, mb + ("mlp", "fc1"), sd, f"{tb}.mlp.fc1")
            _convert_conv(params, mb + ("mlp", "dwconv"), sd, f"{tb}.mlp.dwconv.dwconv")
            _convert_dense(params, mb + ("mlp", "fc2"), sd, f"{tb}.mlp.fc2")
            i += 1
        _convert_ln(params, enc + (f"norm{s}",), sd, f"Tenc_x2.norm{s}")
    dec = ("TDec_x2",)
    for s in range(1, 5):
        _convert_dense(params, dec + (f"linear_c{s}",), sd, f"TDec_x2.linear_c{s}.proj")
        # conv_diff Sequential(conv, relu, bn, conv, relu) -> indices 0, 2, 3
        d = f"TDec_x2.diff_c{s}"
        _convert_conv(params, dec + (f"diff_c{s}", "Conv_0"), sd, f"{d}.0")
        _convert_bn(params, bstats, dec + (f"diff_c{s}", "BatchNorm_0"), sd, f"{d}.2")
        _convert_conv(params, dec + (f"diff_c{s}", "Conv_1"), sd, f"{d}.3")
        m = f"TDec_x2.make_pred_c{s}"
        _convert_conv(params, dec + (f"make_pred_c{s}", "Conv_0"), sd, f"{m}.0")
        _convert_bn(params, bstats, dec + (f"make_pred_c{s}", "BatchNorm_0"), sd, f"{m}.2")
        _convert_conv(params, dec + (f"make_pred_c{s}", "Conv_1"), sd, f"{m}.3")
    _convert_conv(params, dec + ("linear_fuse",), sd, "TDec_x2.linear_fuse.0")
    _convert_bn(params, bstats, dec + ("fuse_bn",), sd, "TDec_x2.linear_fuse.1")
    _convert_tconv(params, dec + ("convd2x",), sd, "TDec_x2.convd2x.conv2d")
    _convert_tconv(params, dec + ("convd1x",), sd, "TDec_x2.convd1x.conv2d")
    for name in ("dense_2x", "dense_1x"):
        _convert_conv(params, dec + (name, "conv1"), sd, f"TDec_x2.{name}.0.conv1.conv2d")
        _convert_conv(params, dec + (name, "conv2"), sd, f"TDec_x2.{name}.0.conv2.conv2d")
    _convert_conv(params, dec + ("change_probability",), sd, "TDec_x2.change_probability.conv2d")
    return {"params": params, "batch_stats": bstats}


# ---------------------------------------------------------------------------
# BiT transformer variants (reference models/bit_cd.py:802-934 BASE_Transformer
# <-> models/bit_cd.py BiTTransformer). Extends convert_bit_resnet (trunk +
# conv_pred + classifier share names) with tokenizer/encoder/decoder weights.
# ---------------------------------------------------------------------------

def convert_bit_transformer(sd: dict[str, np.ndarray]) -> dict:
    variables = convert_bit_resnet(sd)
    params, bstats = variables["params"], variables["batch_stats"]
    _set(params, ("pos_embedding",), sd["pos_embedding"])
    _convert_conv(params, ("conv_a",), sd, "conv_a")
    # token transformer encoder: layers.{i}.0 = PreNorm(Attention),
    # layers.{i}.1 = PreNorm(FeedForward with net.0 / net.3 Linears)
    i = 0
    while f"transformer.layers.{i}.0.fn.norm.weight" in sd:
        t = f"transformer.layers.{i}"
        p = ("transformer",)
        _convert_ln(params, p + (f"norm_attn_{i}",), sd, f"{t}.0.fn.norm")
        _convert_dense(params, p + (f"attn_{i}", "to_qkv"), sd, f"{t}.0.fn.fn.to_qkv")
        _convert_dense(params, p + (f"attn_{i}", "to_out"), sd, f"{t}.0.fn.fn.to_out.0")
        _convert_ln(params, p + (f"norm_ff_{i}",), sd, f"{t}.1.fn.norm")
        _convert_dense(params, p + (f"ff_{i}", "Dense_0"), sd, f"{t}.1.fn.fn.net.0")
        _convert_dense(params, p + (f"ff_{i}", "Dense_1"), sd, f"{t}.1.fn.fn.net.3")
        i += 1
    # per-frame decoder: PreNorm2 (query and memory share the norm)
    i = 0
    while f"transformer_decoder.layers.{i}.0.fn.norm.weight" in sd:
        t = f"transformer_decoder.layers.{i}"
        p = ("transformer_decoder",)
        _convert_ln(params, p + (f"norm_attn_{i}",), sd, f"{t}.0.fn.norm")
        for proj in ("to_q", "to_k", "to_v"):
            _convert_dense(params, p + (f"attn_{i}", proj), sd, f"{t}.0.fn.fn.{proj}")
        _convert_dense(params, p + (f"attn_{i}", "to_out"), sd, f"{t}.0.fn.fn.to_out.0")
        _convert_ln(params, p + (f"norm_ff_{i}",), sd, f"{t}.1.fn.norm")
        _convert_dense(params, p + (f"ff_{i}", "Dense_0"), sd, f"{t}.1.fn.fn.net.0")
        _convert_dense(params, p + (f"ff_{i}", "Dense_1"), sd, f"{t}.1.fn.fn.net.3")
        i += 1
    return {"params": params, "batch_stats": bstats}


# ---------------------------------------------------------------------------
# ADHR-CDNet (reference models/adhr_cdnet.py:111-576 <-> models/adhr_cdnet.py)
# ---------------------------------------------------------------------------

def _convert_convbn_pair(params, bstats, prefix: tuple, sd, conv_key, bn_key):
    """reference (convX, bnX) pair -> our _ConvBN (Conv_0 + BatchNorm_0)."""
    _convert_conv(params, prefix + ("Conv_0",), sd, conv_key)
    _convert_bn(params, bstats, prefix + ("BatchNorm_0",), sd, bn_key)


def _convert_adhr_basic(params, bstats, prefix: tuple, sd, t: str):
    """BasicBlock: conv1/bn1 + conv2/bn2 -> _ConvBN_0/_ConvBN_1."""
    _convert_convbn_pair(params, bstats, prefix + ("_ConvBN_0",), sd, f"{t}.conv1", f"{t}.bn1")
    _convert_convbn_pair(params, bstats, prefix + ("_ConvBN_1",), sd, f"{t}.conv2", f"{t}.bn2")


def convert_adhr(sd: dict[str, np.ndarray]) -> dict:
    """Reference ADHR state_dict -> flax variables. Skips the reference's
    dead parameters (convf2/bnf2..., conv4_*to*, the shadowed 128->1 'final'
    at adhr_cdnet.py:285) — they are constructed but never used in forward."""
    params: dict = {}
    bstats: dict = {}
    # stem
    _convert_conv(params, ("conv0_0",), sd, "conv0_0")
    _convert_conv(params, ("conv0",), sd, "conv0")
    _convert_bn(params, bstats, ("bn0",), sd, "bn0")
    # part one: BottleneckN + 3x Bottleneck (bn3 shared with shortcut in _n)
    t = "conv1_1_1"
    _convert_convbn_pair(params, bstats, (t, "_ConvBN_0"), sd, f"{t}.conv1", f"{t}.bn1")
    _convert_convbn_pair(params, bstats, (t, "_ConvBN_1"), sd, f"{t}.conv2", f"{t}.bn2")
    _convert_conv(params, (t, "conv3"), sd, f"{t}.conv3")
    _convert_conv(params, (t, "conv1_1"), sd, f"{t}.conv1_1")
    _convert_bn(params, bstats, (t, "bn3"), sd, f"{t}.bn3")
    for i in (2, 3, 4):
        t = f"conv1_1_{i}"
        _convert_convbn_pair(params, bstats, (t, "_ConvBN_0"), sd, f"{t}.conv1", f"{t}.bn1")
        _convert_convbn_pair(params, bstats, (t, "_ConvBN_1"), sd, f"{t}.conv2", f"{t}.bn2")
        _convert_convbn_pair(params, bstats, (t, "_ConvBN_2"), sd, f"{t}.conv3", f"{t}.bn3")
    _convert_convbn_pair(params, bstats, ("trans1_1",), sd, "conv1_1", "bn1_1")
    _convert_convbn_pair(params, bstats, ("trans1_2",), sd, "conv1_2", "bn1_2")
    # branch stages: stage{s}_b{j} <- conv{s}_{j}_{1..4}
    branch_counts = {2: 2, 3: 3, 4: 4}
    for s, nb in branch_counts.items():
        for j in range(1, nb + 1):
            for i in range(1, 5):
                _convert_adhr_basic(
                    params, bstats, (f"stage{s}_b{j}", f"b{i}"), sd, f"conv{s}_{j}_{i}"
                )
    # differential VGG streams + 1x1 fusers
    for s in (2, 3, 4):
        _convert_convbn_pair(params, bstats, (f"conv{s}", "_ConvBN_0"), sd, f"conv{s}.conv1", f"conv{s}.bn1")
        _convert_convbn_pair(params, bstats, (f"conv{s}", "_ConvBN_1"), sd, f"conv{s}.conv2", f"conv{s}.bn2")
        _convert_conv(params, (f"c{s}",), sd, f"c{s}")
    # exchange units (stage 2 and 3 only; stage 4 has none in forward)
    up_links = {
        ("t2_2to1", "conv2_2to1"), ("t3_2to1", "conv3_2to1"), ("t3_3to1", "conv3_3to1"),
        ("t3_3to2", "conv3_3to2"),
    }
    for ours, ref in up_links:
        _convert_convbn_pair(params, bstats, (ours, "_ConvBN_0"), sd, ref, ref.replace("conv", "bn", 1))
    down_chains = {
        "t2_1to2": ["conv2_1to2"],
        "t2_1to3": ["conv2_1to3_1", "conv2_1to3_2"],
        "t2_2to3": ["conv2_2to3"],
        "t3_1to2": ["conv3_1to2"],
        "t3_1to3": ["conv3_1to3_1", "conv3_1to3_2"],
        "t3_2to3": ["conv3_2to3"],
        "t3_1to4": ["conv3_1to4_1", "conv3_1to4_2", "conv3_1to4_3"],
        "t3_2to4": ["conv3_2to4_1", "conv3_2to4_2"],
        "t3_3to4": ["conv3_3to4"],
    }
    for ours, refs in down_chains.items():
        for i, ref in enumerate(refs):
            _convert_convbn_pair(
                params, bstats, (ours, f"d{i}", ), sd, ref, ref.replace("conv", "bn", 1)
            )
    # final fusion: f{2,3,4} <- conv{2,3,4}f / bn{2,3,4}f (NOT the dead convf*)
    for s in (2, 3, 4):
        _convert_convbn_pair(params, bstats, (f"f{s}", "_ConvBN_0"), sd, f"conv{s}f", f"bn{s}f")
    _convert_conv(params, ("attention1",), sd, "attention1")
    _convert_conv(params, ("attention2",), sd, "attention2")
    _convert_conv(params, ("final",), sd, "final")
    return {"params": params, "batch_stats": bstats}


# ---------------------------------------------------------------------------
# UperNet (HF openmmlab/upernet-{convnext,swin}-* checkpoints, the models the
# reference loads with from_pretrained at models/upernet.py:28-77
# <-> kurosiwo_tpu/models/{upernet,swin}.py)
# ---------------------------------------------------------------------------

def _convert_upernet_convbn(params, bstats, prefix, sd, key):
    """HF UperNetConvModule: {key}.conv (no bias) + {key}.batch_norm."""
    _convert_conv(params, prefix + ("Conv_0",), sd, f"{key}.conv")
    _convert_bn(params, bstats, prefix + ("BatchNorm_0",), sd, f"{key}.batch_norm")


def _convert_upernet_head(params, bstats, sd):
    head = ("decode_head",)
    for i in range(3):
        _convert_upernet_convbn(params, bstats, head + (f"lateral{i}",), sd, f"decode_head.lateral_convs.{i}")
        _convert_upernet_convbn(params, bstats, head + (f"fpn_conv{i}",), sd, f"decode_head.fpn_convs.{i}")
    for i in range(4):
        _convert_upernet_convbn(params, bstats, head + ("psp", f"branch{i}"), sd, f"decode_head.psp_modules.{i}.1")
    _convert_upernet_convbn(params, bstats, head + ("psp", "bottleneck"), sd, "decode_head.bottleneck")
    _convert_upernet_convbn(params, bstats, head + ("fpn_bottleneck",), sd, "decode_head.fpn_bottleneck")
    _convert_conv(params, head + ("classifier",), sd, "decode_head.classifier")


def convert_upernet_convnext(sd: dict[str, np.ndarray]) -> dict:
    params: dict = {}
    bstats: dict = {}
    bb = ("backbone",)
    _convert_conv(params, bb + ("stem",), sd, "backbone.embeddings.patch_embeddings")
    _convert_ln(params, bb + ("stem_norm",), sd, "backbone.embeddings.layernorm")
    s = 0
    while f"backbone.encoder.stages.{s}.layers.0.dwconv.weight" in sd:
        if s > 0:
            _convert_ln(params, bb + (f"down_norm{s}",), sd, f"backbone.encoder.stages.{s}.downsampling_layer.0")
            _convert_conv(params, bb + (f"down{s}",), sd, f"backbone.encoder.stages.{s}.downsampling_layer.1")
        b = 0
        while f"backbone.encoder.stages.{s}.layers.{b}.dwconv.weight" in sd:
            t = f"backbone.encoder.stages.{s}.layers.{b}"
            p = bb + (f"stage{s}_block{b}",)
            _convert_conv(params, p + ("dwconv",), sd, f"{t}.dwconv")
            _convert_ln(params, p + ("norm",), sd, f"{t}.layernorm")
            _convert_dense(params, p + ("pwconv1",), sd, f"{t}.pwconv1")
            _convert_dense(params, p + ("pwconv2",), sd, f"{t}.pwconv2")
            _set(params, p + ("gamma",), sd[f"{t}.layer_scale_parameter"])
            b += 1
        _convert_ln(params, bb + (f"out_norm{s}",), sd, f"backbone.hidden_states_norms.stage{s + 1}")
        s += 1
    _convert_upernet_head(params, bstats, sd)
    return {"params": params, "batch_stats": bstats}


def convert_upernet_swin(sd: dict[str, np.ndarray]) -> dict:
    params: dict = {}
    bstats: dict = {}
    bb = ("backbone",)
    _convert_conv(params, bb + ("patch_embed",), sd, "backbone.embeddings.patch_embeddings.projection")
    _convert_ln(params, bb + ("patch_norm",), sd, "backbone.embeddings.norm")
    s = 0
    while f"backbone.encoder.layers.{s}.blocks.0.layernorm_before.weight" in sd:
        if s > 0:
            # HF downsample lives at the END of stage s-1; our merge{s} is the
            # same op in the chain. HF patch-merging concat order is
            # (row0col0, row1col0, row0col1, row1col1) vs our row-major
            # (00, 01, 10, 11): permute the reduction's input groups [0,2,1,3]
            ds = f"backbone.encoder.layers.{s - 1}.downsample"
            _convert_ln(params, bb + (f"merge_norm{s}",), sd, f"{ds}.norm")
            w = dense_kernel(sd[f"{ds}.reduction.weight"])  # (4C, 2C)
            c = w.shape[0] // 4
            groups = w.reshape(4, c, -1)[[0, 2, 1, 3]].reshape(4 * c, -1)
            _set(params, bb + (f"merge{s}", "kernel"), groups)
            # norm permutes identically (it normalizes the concatenated dim)
            ln_scale = params["backbone"][f"merge_norm{s}"]["scale"]
            ln_bias = params["backbone"][f"merge_norm{s}"]["bias"]
            perm = np.arange(4 * c).reshape(4, c)[[0, 2, 1, 3]].reshape(-1)
            params["backbone"][f"merge_norm{s}"]["scale"] = ln_scale[perm]
            params["backbone"][f"merge_norm{s}"]["bias"] = ln_bias[perm]
        b = 0
        while f"backbone.encoder.layers.{s}.blocks.{b}.layernorm_before.weight" in sd:
            t = f"backbone.encoder.layers.{s}.blocks.{b}"
            p = bb + (f"stage{s}_block{b}",)
            _convert_ln(params, p + ("norm1",), sd, f"{t}.layernorm_before")
            att = f"{t}.attention"
            qw = sd[f"{att}.self.query.weight"]
            kw = sd[f"{att}.self.key.weight"]
            vw = sd[f"{att}.self.value.weight"]
            _set(params, p + ("attn", "qkv", "kernel"), dense_kernel(np.concatenate([qw, kw, vw], 0)))
            qb = sd[f"{att}.self.query.bias"]
            kb = sd[f"{att}.self.key.bias"]
            vb = sd[f"{att}.self.value.bias"]
            _set(params, p + ("attn", "qkv", "bias"), np.concatenate([qb, kb, vb], 0))
            _set(
                params, p + ("attn", "relative_position_bias"),
                sd[f"{att}.self.relative_position_bias_table"],
            )
            _convert_dense(params, p + ("attn", "proj"), sd, f"{att}.output.dense")
            _convert_ln(params, p + ("norm2",), sd, f"{t}.layernorm_after")
            _convert_dense(params, p + ("fc1",), sd, f"{t}.intermediate.dense")
            _convert_dense(params, p + ("fc2",), sd, f"{t}.output.dense")
            b += 1
        _convert_ln(params, bb + (f"out_norm{s}",), sd, f"backbone.hidden_states_norms.stage{s + 1}")
        s += 1
    _convert_upernet_head(params, bstats, sd)
    return {"params": params, "batch_stats": bstats}


def convert_upernet(sd: dict[str, np.ndarray]) -> dict:
    """Dispatch on backbone family present in the HF state dict."""
    if any("dwconv" in k for k in sd):
        return convert_upernet_convnext(sd)
    return convert_upernet_swin(sd)


def load_pretrained_upernet(model_name: str, num_channels: int, num_classes: int) -> dict:
    """Reference parity for `/root/reference/models/upernet.py:28-77`:
    `UperNetForSemanticSegmentation.from_pretrained(openmmlab/upernet-...)`,
    first conv replaced with a fresh one for `num_channels`, classifier
    swapped to `num_classes` — then converted to flax variables. Requires the
    HF checkpoint to be locally cached or the network reachable."""
    import torch
    from transformers import UperNetForSemanticSegmentation

    m = UperNetForSemanticSegmentation.from_pretrained(model_name)
    emb = m.backbone.embeddings.patch_embeddings
    proj = getattr(emb, "projection", emb)  # swin nests a .projection conv
    fresh = torch.nn.Conv2d(
        num_channels, proj.out_channels, kernel_size=proj.kernel_size,
        stride=proj.stride, padding=proj.padding,
    )
    if hasattr(emb, "projection"):
        emb.projection = fresh
        emb.num_channels = num_channels
    else:
        m.backbone.embeddings.patch_embeddings = fresh
    head = m.decode_head.classifier
    m.decode_head.classifier = torch.nn.Conv2d(head.in_channels, num_classes, kernel_size=1)
    sd = {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}
    return convert_upernet(sd)


def convert_smp_unet(sd: dict[str, np.ndarray]) -> dict:
    """smp.Unet full checkpoint (the reference's resume format for
    `--method=unet`, `/root/reference/models/model_utilities.py:174-177`:
    `torch.load(...)` of an smp.Unet with a resnet encoder) -> UNet
    variables.

    smp schema: `encoder.*` is a torchvision resnet; each decoder block is
    two Conv2dReLU stages (`decoder.blocks.{i}.conv{1,2}.0` conv /
    `.1` batchnorm) whose conv1 input is cat(upsampled, skip) — matching
    this UNet's DecoderBlock channel order — and `segmentation_head.0` is
    the 3x3 classifier. NOTE: segmentation_models_pytorch is not installed
    in this environment, so unlike the other converters this one is covered
    by a structural round-trip test (tests/test_convert_parity.py) rather
    than a live-oracle parity test; the schema follows smp 0.3.x."""
    enc = convert_torchvision_resnet(sd, prefix="encoder.")
    params: dict = {"encoder": enc["params"]}
    bstats: dict = {"encoder": enc["batch_stats"]}
    i = 0
    while f"decoder.blocks.{i}.conv1.0.weight" in sd:
        blk = (f"DecoderBlock_{i}",)
        for ci, name in ((1, "ConvBNAct_0"), (2, "ConvBNAct_1")):
            _convert_conv(params, blk + (name, "Conv_0"), sd, f"decoder.blocks.{i}.conv{ci}.0")
            _convert_bn(params, bstats, blk + (name, "BatchNorm_0"), sd,
                        f"decoder.blocks.{i}.conv{ci}.1")
        i += 1
    _convert_conv(params, ("head",), sd, "segmentation_head.0")
    return {"params": params, "batch_stats": bstats}


def convert_finetune(sd: dict[str, np.ndarray]) -> dict:
    """FinetunerSegmentation state_dict (model_utilities.py:50-94) -> flax.

    `model.*` is the FloodViT encoder (mlp_head replaced by Identity before
    saving); `head.*` is one of: Sequential of two 1x1 convs (mlp), the
    3-deconv Decoder, or a single 1x1 conv (linear)."""
    enc_sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    params: dict = {"encoder": convert_floodvit(enc_sd)["params"]}
    if "head.0.weight" in sd:  # mlp head: Conv1x1 -> ReLU -> Conv1x1
        _convert_conv(params, ("head_fc1",), sd, "head.0")
        _convert_conv(params, ("head_fc2",), sd, "head.2")
    elif "head.deconv1.weight" in sd:  # deconv Decoder head
        for d in ("deconv1", "deconv2", "deconv3"):
            _convert_tconv(params, ("head", d), sd, f"head.{d}")
    elif "head.weight" in sd:  # linear (single 1x1 conv) head
        _convert_conv(params, ("head_fc",), sd, "head")
    else:
        raise KeyError("unrecognized finetune head layout in state_dict")
    return {"params": params}


CONVERTERS: dict[str, Callable[[dict], dict]] = {
    "finetune": convert_finetune,
    "snunet": convert_snunet,
    "floodvit": convert_floodvit,
    "vit": convert_floodvit,
    "siam-diff": convert_siam,
    "siam-conc": convert_siam,
    "bit-cd": convert_bit_resnet,
    "bit-cd-transformer": convert_bit_transformer,
    "convlstm": convert_convlstm,
    "changeformer": convert_changeformer,
    "transunet-cd": convert_transunet_cd,
    "hfa-net": convert_hfanet,
    "adhr-cdnet": convert_adhr,
    "upernet": convert_upernet,
    "unet": convert_smp_unet,
}


def convert(path: str, model: str) -> dict:
    """CLI-facing conversion: torch checkpoint file -> flax variables."""
    if model not in CONVERTERS:  # validate before the multi-hundred-MB unpickle
        raise KeyError(f"no converter for {model!r}; have {sorted(CONVERTERS)}")
    sd = load_torch_state_dict(path)
    return CONVERTERS[model](sd)
