"""Model zoo: forward shape/dtype under jit for every architecture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kurosiwo_tpu.models.factory import (
    build_mae,
    initialize_cd_model,
    initialize_recurrent_model,
    initialize_segmentation_model,
)

SIZE = 64  # small spatial size keeps CPU tests fast; all models are fully conv
B, CH, NC = 2, 6, 3


def _init_and_apply(model, *inputs, train=False):
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng, "mask": rng}, *inputs, train=train)
    out = model.apply(variables, *inputs, train=train, rngs={"dropout": rng, "mask": rng})
    return out, variables


@pytest.mark.parametrize("method", ["unet", "unetplusplus", "deeplabv3"])
def test_segmentation_models(base_config, method):
    cfg = dict(base_config, method=method, num_channels=CH)
    model = initialize_segmentation_model(cfg, {"backbone": "resnet18"})
    x = jnp.zeros((B, SIZE, SIZE, CH))
    out, _ = _init_and_apply(model, x)
    assert out.shape == (B, SIZE, SIZE, NC)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize("method", ["siam-diff", "siam-conc", "snunet"])
def test_cd_models(base_config, method):
    cfg = dict(base_config, task="cd", method=method, num_channels=2)
    model = initialize_cd_model(cfg, {"base_channel": 32})
    x = jnp.zeros((B, SIZE, SIZE, 2))
    out, _ = _init_and_apply(model, x, x)
    assert out.shape == (B, SIZE, SIZE, NC)


def test_siam_outputs_are_log_probs(base_config):
    cfg = dict(base_config, task="cd", method="siam-diff", num_channels=2)
    model = initialize_cd_model(cfg, {})
    x = jnp.asarray(np.random.RandomState(0).randn(1, SIZE, SIZE, 2), jnp.float32)
    out, _ = _init_and_apply(model, x, x)
    # log-softmax rows exponentiate-sum to 1 (reference siam_diff.py:173)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, atol=5e-4)


def test_convlstm(base_config):
    cfg = dict(base_config, method="convlstm", num_channels=2)
    model = initialize_recurrent_model(cfg, {})
    x = jnp.zeros((B, 3, SIZE, SIZE, 2))
    out, _ = _init_and_apply(model, x)
    assert out.shape == (B, SIZE, SIZE, NC)
    # softmax inside the model (reference convlstm.py:223-226)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-4)


def test_vit_returns_patch_tokens():
    from kurosiwo_tpu.models.vit import ViT

    model = ViT(image_size=SIZE, patch_size=16, dim=64, depth=2, heads=2, mlp_dim=128, channels=CH)
    x = jnp.zeros((B, SIZE, SIZE, CH))
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, x)
    out = model.apply(variables, x)
    n = (SIZE // 16) ** 2
    assert out.shape == (B, n, 64)  # all patch tokens, no head (pool="cls" quirk)


def test_mae_loss_scalar(base_config):
    cfg = dict(base_config, num_channels=CH)
    mcfg = {"image_size": SIZE, "patch_size": 16, "dim": 64, "depth": 2, "heads": 2,
            "mlp_dim": 128, "decoder_dim": 32, "decoder_depth": 1, "decoder_heads": 2,
            "masked_ratio": 0.75}
    model = build_mae(cfg, mcfg)
    x = jnp.asarray(np.random.RandomState(0).randn(B, SIZE, SIZE, CH), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "mask": rng}, x)
    loss = model.apply(variables, x, rngs={"mask": rng})
    assert loss.shape == () and float(loss) > 0


def test_finetuner_heads(base_config):
    from kurosiwo_tpu.models.finetuner import FinetunerSegmentation
    from kurosiwo_tpu.models.vit import ViT

    enc = ViT(image_size=SIZE, patch_size=16, dim=64, depth=1, heads=2, mlp_dim=64, channels=CH)
    for head in ["mlp", "decoder", "linear"]:
        model = FinetunerSegmentation(encoder=enc, num_classes=NC, head=head,
                                      finetuning_patch_size=16, image_size=SIZE)
        x = jnp.zeros((B, SIZE, SIZE, CH))
        out, _ = _init_and_apply(model, x)
        assert out.shape == (B, SIZE, SIZE, NC), head


def test_patchify_roundtrip():
    from kurosiwo_tpu.models.vit import patchify, unpatchify

    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 2), jnp.float32)
    p = patchify(x, 16)
    assert p.shape == (1, 4, 16 * 16 * 2)
    back = unpatchify(p, 16, 32, 32, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_vit_embed_image_matches_embed_patches():
    """embed_image (strided-view stats + folded conv) must match the
    patchify->LN->Dense->LN path it replaces (r3 MAE copy-elimination)."""
    import numpy as np

    from kurosiwo_tpu.models.vit import ViT, patchify

    m = ViT(image_size=64, patch_size=16, dim=96, depth=1, heads=2,
            mlp_dim=128, channels=6, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 64, 64, 6), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    a = m.apply(v, x, method=lambda mdl, im: mdl.embed_image(im))
    b = m.apply(v, x, method=lambda mdl, im: mdl.embed_patches(patchify(im, 16)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)
