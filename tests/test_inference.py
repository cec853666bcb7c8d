"""Scene inference: sliding-window blending, tiling edge cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class _ConstModel:
    """Fake model: logits favor class = round(mean of window) so blending is
    easy to reason about."""

    def apply(self, variables, x, train=False):
        b = x.shape[0]
        m = jnp.mean(x, axis=(1, 2, 3))
        logits = jnp.stack([jnp.zeros_like(m), m, -m], axis=-1)
        return jnp.broadcast_to(logits[:, None, None, :], (b, x.shape[1], x.shape[2], 3))


def test_predict_scene_shapes_and_blend():
    from kurosiwo_tpu.inference import TilePredictor, predict_scene

    pred = TilePredictor(_ConstModel(), {}, tile=64, batch_size=4)
    scene = np.ones((150, 200, 2), np.float32)  # mean 1 -> class 1 wins
    mask = predict_scene(pred, scene, overlap=16)
    assert mask.shape == (150, 200)
    assert (mask == 1).all()


def test_predict_scene_smaller_than_tile():
    from kurosiwo_tpu.inference import TilePredictor, predict_scene

    pred = TilePredictor(_ConstModel(), {}, tile=64, batch_size=2)
    scene = -np.ones((40, 50, 2), np.float32)  # mean -1 -> class 2 wins
    mask = predict_scene(pred, scene, overlap=16)
    assert mask.shape == (40, 50)
    assert (mask == 2).all()


def test_tile_predictor_ragged_batch():
    from kurosiwo_tpu.inference import TilePredictor

    pred = TilePredictor(_ConstModel(), {}, tile=32, batch_size=4)
    tiles = np.ones((7, 32, 32, 2), np.float32)
    out = pred.predict(tiles)
    assert out.shape == (7, 32, 32)


def test_real_unet_scene_smoke(base_config):
    from kurosiwo_tpu.inference import TilePredictor, predict_scene
    from kurosiwo_tpu.models.factory import initialize_segmentation_model

    cfg = dict(base_config, num_channels=2)
    model = initialize_segmentation_model(cfg, {"backbone": "resnet18"})
    x = jnp.zeros((1, 64, 64, 2))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    pred = TilePredictor(model, variables, tile=64, batch_size=2)
    scene = np.random.RandomState(0).rand(100, 130, 2).astype(np.float32)
    mask = predict_scene(pred, scene, overlap=16)
    assert mask.shape == (100, 130)
    assert set(np.unique(mask)) <= {0, 1, 2}


def test_vit_whole_scene_features(base_config):
    import jax
    import jax.numpy as jnp
    from kurosiwo_tpu.models.vit import ViT
    from kurosiwo_tpu.inference import vit_whole_scene

    model = ViT(image_size=64, patch_size=16, dim=32, depth=2, heads=2, mlp_dim=64,
                channels=2, dim_head=16, pool="cls", dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 2), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(v, x)  # per-patch tokens through the regular model
    feats = vit_whole_scene(v["params"], np.asarray(x[0]), patch_size=16, dim=32,
                            depth=2, heads=2, mlp_dim=64, dim_head=16, dtype=jnp.float32)
    assert feats.shape == ref.shape
    # cls token dropped -> not identical, but the representations must agree
    corr = np.corrcoef(np.asarray(ref).ravel(), np.asarray(feats).ravel())[0, 1]
    assert corr > 0.99
    # ragged scene pads up to the patch grid
    feats2 = vit_whole_scene(v["params"], np.zeros((70, 90, 2), np.float32),
                             patch_size=16, dim=32, depth=2, heads=2, mlp_dim=64,
                             dim_head=16, dtype=jnp.float32)
    assert feats2.shape == (1, 5 * 6, 32)


def test_predict_scene_much_smaller_than_tile():
    """pad > dim-1 (reflect's cap) — symmetric multi-pass padding covers it."""
    from kurosiwo_tpu.inference import TilePredictor, predict_scene

    pred = TilePredictor(_ConstModel(), {}, tile=64, batch_size=2)
    scene = np.random.RandomState(3).rand(20, 20, 2).astype(np.float32)
    mask = predict_scene(pred, scene, overlap=16)
    assert mask.shape == (20, 20)


def test_predict_scene_rejects_bad_overlap():
    from kurosiwo_tpu.inference import TilePredictor, predict_scene

    pred = TilePredictor(_ConstModel(), {}, tile=64, batch_size=2)
    scene = np.zeros((100, 100, 2), np.float32)
    with pytest.raises(ValueError, match="overlap"):
        predict_scene(pred, scene, overlap=64)
    with pytest.raises(ValueError, match="overlap"):
        predict_scene(pred, scene, overlap=300)


def test_load_variables_missing_checkpoint_raises(base_config):
    from kurosiwo_tpu.inference import load_variables
    from kurosiwo_tpu.models.factory import initialize_segmentation_model

    mcfg = {"backbone": "resnet18"}
    cfg = dict(base_config)
    model = initialize_segmentation_model(cfg, mcfg)
    with pytest.raises(FileNotFoundError):
        load_variables("/nonexistent/ckpt_typo", model, cfg, (1, 64, 64, 2))
