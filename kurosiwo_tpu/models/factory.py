"""Model factories mirroring the reference's dispatch
(`/root/reference/models/model_utilities.py:97-237`): method-name keyed
construction of segmentation / change-detection / recurrent models.

Returned objects are flax.linen Modules; parameter initialization happens in
the trainers (pure init with explicit PRNG keys). The reference's
`resume_checkpoint` reload is handled by kurosiwo_tpu.training.checkpoint.

Note: the reference's TransUNet_CD branch crashes with a NameError (missing
import, model_utilities.py:217-228) — fixed here, documented for parity.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp


def _dtype(config: dict):
    return jnp.bfloat16 if config.get("mixed_precision", True) else jnp.float32


def initialize_segmentation_model(config: dict, model_config: dict):
    method = config["method"].lower()
    nc = config["num_classes"]
    dt = _dtype(config)
    if config.get("task") == "diffusion-unsup":
        from .diffusion import DDPMUnet, GaussianDiffusion

        mc = model_config or {}
        unet = DDPMUnet(
            dim=int(mc.get("dim", 64)),
            dim_mults=tuple(mc.get("dim_mults", (1, 2, 4, 8))),
            channels=2,
            dtype=dt,
        )
        return GaussianDiffusion(
            model=unet, timesteps=int(mc.get("timesteps", 1000)), loss_type="l1"
        )
    if method == "unet":
        from ..ops.pallas_tail import resolve_fused_tail
        from .unet import UNet

        return UNet(
            num_classes=nc, backbone=model_config.get("backbone", "resnet18"), dtype=dt,
            return_phase_logits=resolve_fused_tail(
                config, "segmentation", model_config, strict=False) == "phase",
        )
    if method in ("unetplusplus", "unet++"):
        from .unet import UNetPlusPlus

        return UNetPlusPlus(num_classes=nc, backbone=model_config.get("backbone", "resnet18"), dtype=dt)
    if method == "deeplabv3":
        from .unet import DeepLabV3Plus

        return DeepLabV3Plus(num_classes=nc, backbone=model_config.get("backbone", "resnet18"), dtype=dt)
    if method == "upernet":
        from .upernet import UperNet

        return UperNet(
            num_classes=nc, backbone=model_config.get("backbone", "convnext_tiny"), dtype=dt
        )
    if method == "finetune":
        from .finetuner import FinetunerSegmentation
        from .vit import ViT

        encoder = ViT(
            image_size=config.get("image_size", 224),
            patch_size=config.get("finetuning_patch_size", 16),
            dim=config.get("dim", 1024),
            depth=config.get("depth", 24),
            heads=config.get("heads", 16),
            mlp_dim=config.get("mlp_dim", 2048),
            channels=config["num_channels"],
            pool="cls",
            dtype=dt,
        )
        head = "mlp" if config.get("mlp") else ("decoder" if config.get("decoder") else "linear")
        return FinetunerSegmentation(
            encoder=encoder,
            num_classes=nc,
            head=head,
            finetuning_patch_size=config.get("finetuning_patch_size", 16),
            image_size=config.get("image_size", 224),
            dtype=dt,
        )
    raise NotImplementedError(f"segmentation method {method!r} is not supported")


def initialize_cd_model(config: dict, model_config: dict, phase: str = "train"):
    method = config["method"].lower()
    nc = config["num_classes"]
    n_in = config["num_channels"]
    dt = _dtype(config)
    if method == "siam-conc":
        from .siam import SiamUnetConc

        return SiamUnetConc(num_classes=nc, dtype=dt)
    if method == "siam-diff":
        from .siam import SiamUnetDiff

        return SiamUnetDiff(num_classes=nc, dtype=dt)
    if method == "snunet":
        from .snunet import SNUNetECAM

        # remat defaults ON at batch >= 64: the dense nested-skip decoder
        # only fits the reference's batch 128 on one v5e chip with the
        # column-granular remat plan (docs/performance.md); an explicit
        # config "remat" key still wins either way
        remat = config["remat"] if "remat" in config else int(config.get("batch_size", 0)) >= 64
        return SNUNetECAM(
            num_classes=nc, base_channel=model_config.get("base_channel", 32),
            remat=bool(remat),
            save_bn_stats=bool(config.get("snunet_save_bn_stats", True)),
            # dts-up measured 221.4 vs 248.1 p/s at b128 (regression) — opt-in
            dts_up=bool(config.get("snunet_dts_up", False)),
            # phase-space levels measured 246 -> 146 patches/s at b128:
            # the folded 3x3 phase kernels burn 2.25x dense FLOPs
            # (structural-zero taps), which outweighs the lane-padding
            # win — XLA already handles the canonical small-C convs
            # better than the naive 25%-lane model predicts. Opt-in only.
            phase_l0=bool(config.get("snunet_phase", False)),
            dtype=dt,
        )
    if method == "bit-cd":
        from .bit_cd import build_bit_cd

        return build_bit_cd(model_config, num_classes=nc, dtype=dt)
    if method == "hfa-net":
        from .hfanet import HFANet

        return HFANet(num_classes=nc, dtype=dt)
    if method == "changeformer":
        from .changeformer import ChangeFormerV6

        return ChangeFormerV6(
            embed_dim=model_config.get("embed_dim", 256),
            num_classes=nc,
            decoder_softmax=model_config.get("decoder_softmax", True),
            tail_chunks=model_config.get("tail_chunks", 0),
            remat_ffn=model_config.get("remat_ffn", "auto"),
            dtype=dt,
        )
    if method == "adhr-cdnet":
        from .adhr_cdnet import ADHR

        return ADHR(num_classes=nc, dtype=dt)
    if method == "transunet-cd":
        from .transunet_cd import TransUNetCD

        return TransUNetCD(
            out_channels=model_config.get("out_channels", 128),
            head_num=model_config.get("head_num", 4),
            mlp_dim=model_config.get("mlp_dim", 512),
            block_num=model_config.get("block_num", 8),
            patch_dim=model_config.get("patch_dim", 16),
            num_classes=nc,
            siamese=model_config.get("siamese", False),
            dtype=dt,
        )
    raise NotImplementedError(f"cd method {method!r} is not supported")


def initialize_recurrent_model(config: dict, model_config: dict, phase: str = "train"):
    if config["method"] == "convlstm":
        from .convlstm import ConvLSTM

        return ConvLSTM(num_classes=config["num_classes"], dtype=_dtype(config))
    raise NotImplementedError(f"recurrent method {config['method']!r} is not supported")


def build_mae(config: dict, model_config: dict):
    """MAE = ViT encoder + MAE wrapper (reference: train_mae.py:166-184)."""
    from .mae import MAE
    from .vit import ViT

    dt = _dtype(config)
    encoder = ViT(
        image_size=model_config.get("image_size", 224),
        patch_size=model_config.get("patch_size", 16),
        num_classes=model_config.get("num_classes", 1000),
        dim=model_config.get("dim", 1024),
        depth=model_config.get("depth", 24),
        heads=model_config.get("heads", 16),
        mlp_dim=model_config.get("mlp_dim", 2048),
        channels=config["num_channels"],
        pool="cls",
        dtype=dt,
    )
    return MAE(
        encoder=encoder,
        decoder_dim=model_config.get("decoder_dim", 512),
        masking_ratio=model_config.get("masked_ratio", 0.75),
        decoder_depth=model_config.get("decoder_depth", 8),
        decoder_heads=model_config.get("decoder_heads", 16),
        dtype=dt,
    )
