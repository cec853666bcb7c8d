"""Extended model zoo: transformer CD models, HFA-Net, ADHR, UperNet, Swin."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kurosiwo_tpu.models.factory import initialize_cd_model, initialize_segmentation_model

B, NC = 1, 3


def _run(model, *inputs, train=False):
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, *inputs, train=train)
    return model.apply(variables, *inputs, train=train, rngs={"dropout": rng})


def test_bit_cd_resnet(base_config):
    cfg = dict(base_config, task="cd", method="bit-cd", num_channels=2)
    model = initialize_cd_model(cfg, {"net_G": "base_resnet18"})
    x = jnp.zeros((B, 64, 64, 2))
    out = _run(model, x, x)
    assert out.shape == (B, 64, 64, NC)


def test_bit_cd_transformer(base_config):
    cfg = dict(base_config, task="cd", method="bit-cd", num_channels=2)
    model = initialize_cd_model(cfg, {"net_G": "base_transformer_pos_s4_dd8"})
    x = jnp.zeros((B, 64, 64, 2))
    out = _run(model, x, x)
    assert out.shape == (B, 64, 64, NC)


def test_changeformer_multiscale_outputs(base_config):
    cfg = dict(base_config, task="cd", method="changeformer", num_channels=2)
    model = initialize_cd_model(cfg, {"embed_dim": 64, "decoder_softmax": True})
    x = jnp.asarray(np.random.RandomState(0).randn(B, 64, 64, 2), np.float32)
    outs = _run(model, x, x)
    assert isinstance(outs, list) and len(outs) == 5
    assert outs[-1].shape == (B, 64, 64, NC)
    # decoder_softmax=True applies sigmoid -> all in (0, 1)
    assert float(jnp.min(outs[-1])) >= 0.0 and float(jnp.max(outs[-1])) <= 1.0
    # multi-scale heads at 1/32, 1/16, 1/8, 1/4
    assert outs[0].shape == (B, 2, 2, NC)
    assert outs[3].shape == (B, 16, 16, NC)


def test_transunet_cd(base_config):
    cfg = dict(base_config, task="cd", method="transunet-cd", num_channels=2)
    model = initialize_cd_model(
        cfg,
        {"out_channels": 32, "head_num": 4, "mlp_dim": 64, "block_num": 2,
         "patch_dim": 16, "siamese": False},
    )
    x = jnp.zeros((B, 64, 64, 2))
    out = _run(model, x, x)
    assert out.shape == (B, 64, 64, NC)


def test_transunet_cd_siamese_shares_params(base_config):
    cfg = dict(base_config, task="cd", method="transunet-cd", num_channels=2)
    model = initialize_cd_model(
        cfg,
        {"out_channels": 32, "head_num": 4, "mlp_dim": 64, "block_num": 1,
         "patch_dim": 16, "siamese": True},
    )
    x = jnp.zeros((B, 64, 64, 2))
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x, x, train=False)
    assert "encoder" in variables["params"] and "encoder1" not in variables["params"]


def test_hfanet(base_config):
    # HFA-Net's spatial-attention pyramid is geometry-bound to 224-divisible
    # inputs (the reference hardcodes input_size=224, hfanet.py:616-619):
    # the deepest stage runs 14 -> 7 -> 3 -> convtranspose(k3,s3) -> 7 -> 14.
    cfg = dict(base_config, task="cd", method="hfa-net", num_channels=2)
    model = initialize_cd_model(cfg, {})
    x = jnp.asarray(np.random.RandomState(0).randn(1, 224, 224, 2), np.float32)
    out = _run(model, x, x)
    assert out.shape == (1, 224, 224, NC)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=5e-4)  # softmax inside


def test_adhr_cdnet(base_config):
    cfg = dict(base_config, task="cd", method="adhr-cdnet", num_channels=2)
    model = initialize_cd_model(cfg, {})
    x = jnp.asarray(np.random.RandomState(0).randn(B, 64, 64, 2), np.float32)
    out = _run(model, x, x)
    assert out.shape == (B, 64, 64, NC)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=5e-4)  # softmax inside


def test_upernet_convnext(base_config):
    cfg = dict(base_config, method="upernet", num_channels=6)
    model = initialize_segmentation_model(cfg, {"backbone": "convnext_tiny"})
    x = jnp.zeros((B, 64, 64, 6))
    out = _run(model, x)
    assert out.shape == (B, 64, 64, NC)


def test_upernet_swin(base_config):
    cfg = dict(base_config, method="upernet", num_channels=6)
    model = initialize_segmentation_model(cfg, {"backbone": "swin_tiny"})
    x = jnp.zeros((B, 56, 56, 6))
    out = _run(model, x)
    assert out.shape == (B, 56, 56, NC)


def test_hfa_high_frequency_factorization():
    """The channel-sum factorization must equal the reference's dense conv."""
    import torch
    import torch.nn.functional as F
    from kurosiwo_tpu.models.hfanet import high_frequency, _SMOOTH, _SOBEL

    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)

    # reference path (NCHW, dense CxC constant kernels)
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    c = 3
    w_smooth = torch.tensor(_SMOOTH, dtype=torch.float32).expand(c, c, 3, 3).clone()
    xs = F.conv2d(xt, w_smooth, stride=1, padding=1) / 16
    acc = 0
    for kd in _SOBEL:
        for sign in (1, -1):
            wk = sign * torch.tensor(kd, dtype=torch.float32).expand(c, c, 3, 3).clone()
            acc = acc + F.conv2d(xs, wk, stride=1, padding=1)
    ref = (acc / 8).permute(0, 2, 3, 1).numpy()

    ours = np.asarray(high_frequency(jnp.asarray(x), mode="filtering", smooth=True))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_finetune_factory_path(base_config):
    """method=finetune builds FinetunerSegmentation from config keys
    (model_utilities.py:159-167 equivalent) and runs a dense forward."""
    from kurosiwo_tpu.models.factory import initialize_segmentation_model

    cfg = dict(base_config, method="finetune", num_channels=6, mlp=True, decoder=False,
               linear_eval=False, image_size=64, finetuning_patch_size=16,
               dim=32, depth=1, heads=2, mlp_dim=64)
    model = initialize_segmentation_model(cfg, {})
    x = jnp.zeros((1, 64, 64, 6))
    out = _run(model, x)
    assert out.shape == (1, 64, 64, NC)


def test_changeformer_chunked_tail_exact(base_config):
    """The batch-chunked scan-of-remat decoder tail (the b128 HBM fit,
    docs/performance.md r5) is exactly per-sample: same param tree, same
    outputs, same grads as the unchunked path."""
    cfg = dict(base_config, task="cd", method="changeformer", num_channels=2)
    m1 = initialize_cd_model(cfg, {"embed_dim": 64, "tail_chunks": 1, "remat_ffn": False})
    m8 = initialize_cd_model(cfg, {"embed_dim": 64, "tail_chunks": 8, "remat_ffn": True})
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(1).randn(8, 32, 32, 2), np.float32)
    v1 = m1.init({"params": rng, "dropout": rng}, x, x, train=False)
    v8 = m8.init({"params": rng, "dropout": rng}, x, x, train=False)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v8)
    for a, b in zip(jax.tree_util.tree_leaves(v1), jax.tree_util.tree_leaves(v8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    def loss(variables, model):
        outs = model.apply(variables, x, x, train=False)
        return sum(jnp.sum(o * o) for o in outs)

    la, ga = jax.value_and_grad(loss)(v1, m1)
    lb, gb = jax.value_and_grad(loss)(v1, m8)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
