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
