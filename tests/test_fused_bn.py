"""GramBatchNorm == flax.linen.BatchNorm: outputs, batch-stat updates, and
gradients (x, scale, bias), train and eval modes."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kurosiwo_tpu.ops.fused_bn import GramBatchNorm


def _setup(dtype):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 8, 8, 16) * 2 + 0.5, dtype)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5, dtype=dtype)
    ours = GramBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5, dtype=dtype)
    v = ref.init(jax.random.PRNGKey(0), x)
    # non-trivial scale/bias
    v = {
        "params": {"scale": jnp.asarray(rs.rand(16) + 0.5, jnp.float32),
                   "bias": jnp.asarray(rs.randn(16), jnp.float32)},
        "batch_stats": v["batch_stats"],
    }
    return x, ref, ours, v


def test_train_forward_and_stats_match():
    x, ref, ours, v = _setup(jnp.float32)
    yr, mr = ref.apply(v, x, mutable=["batch_stats"])
    yo, mo = ours.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yo), np.asarray(yr), rtol=2e-5, atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mo["batch_stats"][k]), np.asarray(mr["batch_stats"][k]), rtol=2e-5, atol=2e-5
        )


def test_eval_forward_matches():
    x, _, _, v = _setup(jnp.float32)
    v["batch_stats"] = {"mean": jnp.asarray(np.random.RandomState(1).randn(16), jnp.float32),
                        "var": jnp.asarray(np.random.RandomState(2).rand(16) + 0.2, jnp.float32)}
    ref = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
    ours = GramBatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
    yr = ref.apply(v, x)
    yo = ours.apply(v, x)
    np.testing.assert_allclose(np.asarray(yo), np.asarray(yr), rtol=2e-5, atol=2e-5)


def test_train_gradients_match():
    x, ref, ours, v = _setup(jnp.float32)
    t = jnp.asarray(np.random.RandomState(3).randn(*x.shape), jnp.float32)

    def loss(mod):
        def f(params, xx):
            y, _ = mod.apply({"params": params, "batch_stats": v["batch_stats"]},
                             xx, mutable=["batch_stats"])
            return jnp.sum((y - t) ** 2) / x.size
        return f

    (gr_p, gr_x) = jax.grad(loss(ref), argnums=(0, 1))(v["params"], x)
    (go_p, go_x) = jax.grad(loss(ours), argnums=(0, 1))(v["params"], x)
    np.testing.assert_allclose(np.asarray(go_x), np.asarray(gr_x), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(go_p["scale"]), np.asarray(gr_p["scale"]), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(go_p["bias"]), np.asarray(gr_p["bias"]), rtol=3e-4, atol=3e-5)


def test_bf16_train_close_to_f32_reference():
    x, ref, ours, v = _setup(jnp.bfloat16)
    yr, _ = ref.apply(v, x, mutable=["batch_stats"])
    yo, _ = ours.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(yo, np.float32), np.asarray(yr, np.float32), rtol=3e-2, atol=3e-2
    )
