"""Inference / serving: run a trained model over tiles or whole scenes.

The reference has no inference story beyond re-running eval over the test
loader (main.py:146-159). Production-facing additions here:

  * `TilePredictor` — jitted batched forward producing class maps
    (+ optional probabilities) from normalized inputs;
  * `predict_scene` — sliding-window inference over an arbitrarily large
    scene: static-shape window batches (one compile), overlap blending by
    logit averaging, edge padding; this is how whole Sentinel-1 scenes are
    mapped without the reference's fixed-224 restriction;
  * `scene CLI` (`python -m kurosiwo_tpu.inference ...`) — decode VV/VH
    rasters, normalize with the dataset stats, emit a uint8 class mask
    GeoTIFF-shaped array + optional colorized PNG.

Checkpoints load from orbax (`CheckpointManager`) or converted torch state
dicts (`kurosiwo_tpu.convert`).
"""

from __future__ import annotations

import argparse
import functools
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .config import load_config
from .data.normalize import normalize
from .models.factory import initialize_segmentation_model


class TilePredictor:
    """Batched jitted forward for fixed-size tiles."""

    def __init__(self, model, variables: dict, tile: int = 224, batch_size: int = 32):
        self.model = model
        self.variables = variables
        self.tile = tile
        self.batch_size = batch_size
        self._fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    def predict_logits(self, tiles: np.ndarray) -> np.ndarray:
        """(N, T, T, C) -> (N, T, T, num_classes) float32 logits."""
        n = tiles.shape[0]
        outs = []
        bs = self.batch_size
        for i in range(0, n, bs):
            chunk = tiles[i : i + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
            logits = np.asarray(self._fwd(self.variables, jnp.asarray(chunk)))
            outs.append(logits[: bs - pad] if pad else logits)
        return np.concatenate(outs, axis=0)

    def predict(self, tiles: np.ndarray) -> np.ndarray:
        return np.argmax(self.predict_logits(tiles), axis=-1).astype(np.uint8)


def predict_scene(
    predictor: TilePredictor,
    scene: np.ndarray,
    overlap: int = 32,
) -> np.ndarray:
    """Sliding-window class map for an (H, W, C) scene of any size.

    Windows of `tile` with `overlap` stride reduction; overlapping logits are
    averaged (soft blending suppresses window-border artifacts), then argmax.
    """
    t = predictor.tile
    h, w, c = scene.shape
    if not 0 <= overlap < t:
        raise ValueError(
            f"overlap must be in [0, tile={t}), got {overlap} — overlap==tile "
            "gives a zero stride and larger values would leave the scene "
            "mostly unpredicted")
    stride = t - overlap
    ny = max(1, math.ceil(max(h - overlap, 1) / stride))
    nx = max(1, math.ceil(max(w - overlap, 1) / stride))
    pad_h = (ny - 1) * stride + t - h
    pad_w = (nx - 1) * stride + t - w
    # symmetric (not reflect): reflect caps pad width at dim-1, which a
    # scene smaller than the tile exceeds; symmetric allows pad == dim and
    # repeated passes cover any remainder
    padded = scene
    while pad_h > 0 or pad_w > 0:
        ph = min(max(pad_h, 0), padded.shape[0])
        pw = min(max(pad_w, 0), padded.shape[1])
        padded = np.pad(padded, ((0, ph), (0, pw), (0, 0)), mode="symmetric")
        pad_h -= ph
        pad_w -= pw

    tiles, coords = [], []
    for iy in range(ny):
        for ix in range(nx):
            y0, x0 = iy * stride, ix * stride
            tiles.append(padded[y0 : y0 + t, x0 : x0 + t])
            coords.append((y0, x0))
    logits = predictor.predict_logits(np.stack(tiles))

    nc = logits.shape[-1]
    acc = np.zeros(padded.shape[:2] + (nc,), np.float32)
    cnt = np.zeros(padded.shape[:2] + (1,), np.float32)
    for (y0, x0), lg in zip(coords, logits):
        acc[y0 : y0 + t, x0 : x0 + t] += lg
        cnt[y0 : y0 + t, x0 : x0 + t] += 1.0
    blended = acc / np.maximum(cnt, 1.0)
    return np.argmax(blended[:h, :w], axis=-1).astype(np.uint8)


def interpolate_pos_embedding(pos: jnp.ndarray, new_grid: tuple[int, int]) -> jnp.ndarray:
    """Resample a (1, 1+g*g, D) learned position embedding to a new patch
    grid (bilinear over the spatial grid; cls slot dropped — see
    vit_whole_scene)."""
    grid = pos[:, 1:]
    g = int(math.isqrt(grid.shape[1]))
    d = grid.shape[-1]
    gh, gw = new_grid
    img = grid.reshape(1, g, g, d)
    img = jax.image.resize(img, (1, gh, gw, d), method="linear")
    return img.reshape(1, gh * gw, d)


def vit_whole_scene(
    encoder_params: dict,
    scene: np.ndarray,
    patch_size: int = 16,
    dim: int = 1024,
    depth: int = 24,
    heads: int = 16,
    mlp_dim: int = 2048,
    dim_head: int = 64,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Encode an ENTIRE scene as one attention sequence (no 224 tiling).

    The reference is architecturally bound to 224x224 patches (196-token
    attention); here the scene's full patch grid attends globally — the
    Pallas flash kernel engages automatically for sequences >= 1024 tokens
    (ops/attention.py), so a 1024x1024 scene is a single 4096-token pass
    without materializing the (N, N) score matrix.

    Whole-scene mode drops the cls token (its only consumer is the absent
    classification head; FinetunerSegmentation reads patch tokens) so the
    sequence length stays 128-aligned for the kernel. The learned position
    embedding is bilinearly resampled to the scene grid.

    Returns (1, gh*gw, dim) patch features; reshape to (gh, gw, dim) for a
    dense head.
    """
    h, w, c = scene.shape
    ph = -(-h // patch_size) * patch_size
    pw = -(-w // patch_size) * patch_size
    padded = np.pad(scene, ((0, ph - h), (0, pw - w), (0, 0)), mode="reflect")
    gh, gw = ph // patch_size, pw // patch_size

    encode = _scene_encoder(patch_size, dim, depth, heads, mlp_dim, dim_head, dtype, gh, gw)
    return encode(encoder_params, jnp.asarray(padded[None], dtype))


def _embed_scene_tokens(p: dict, x: jnp.ndarray, patch_size: int, dtype, gh: int, gw: int):
    """Patch embed (LN -> Dense -> LN) + resampled positions over the raw
    param tree — deliberately inlined rather than reusing ViT.embed_image:
    inference consumes a bare converted checkpoint (no Module bind), runs the
    projection in f32 for the long token grid, and is pinned to the model by
    the parity test (test_inference.py) — keep the two in sync if the embed
    pipeline changes."""
    from .models.vit import patchify

    patches = patchify(x, patch_size)  # (1, N, p*p*C)

    def ln(name, t):
        s = p[name]
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.var(t, axis=-1, keepdims=True)
        return (t - mu) / jnp.sqrt(var + 1e-6) * s["scale"] + s["bias"]

    tokens = ln("patch_norm1", patches.astype(jnp.float32))
    tokens = tokens @ p["patch_proj"]["kernel"] + p["patch_proj"]["bias"]
    tokens = ln("patch_norm2", tokens).astype(dtype)
    pos = interpolate_pos_embedding(jnp.asarray(p["pos_embedding"]), (gh, gw))
    return tokens + pos.astype(dtype)


@functools.lru_cache(maxsize=8)
def _scene_encoder(patch_size, dim, depth, heads, mlp_dim, dim_head, dtype, gh, gw):
    """Jitted whole-scene encoder, cached per (architecture, grid) so repeat
    scenes of the same size reuse one compilation."""
    from .models.vit import Transformer

    transformer = Transformer(dim, depth, heads, dim_head, mlp_dim, dtype)

    @jax.jit
    def encode(p, x):
        tokens = _embed_scene_tokens(p, x, patch_size, dtype, gh, gw)
        return transformer.apply({"params": p["transformer"]}, tokens)

    return encode


def vit_whole_scene_cp(
    encoder_params: dict,
    scene: np.ndarray,
    mesh,
    axis_name: str = "seq",
    patch_size: int = 16,
    dim: int = 1024,
    depth: int = 24,
    heads: int = 16,
    mlp_dim: int = 2048,
    dim_head: int = 64,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Context-parallel `vit_whole_scene`: the patch-token SEQUENCE is
    sharded over `mesh`'s `axis_name` and every attention layer runs as a
    ring pass (ops/ring_attention), so no device ever holds more than
    N/P tokens of k/v — the scene size one chip can encode is multiplied
    by the ring size (SURVEY §5.7: a 3584x3584 scene is 50k tokens).

    Per-device shards >= 1024 tokens and 128-aligned engage the Pallas flash
    kernels inside each ring step on TPU; smaller shards use the dense block
    (always the case on the CPU test mesh). Everything outside attention is
    token-pointwise and runs on the local shard unchanged, so results equal
    the single-device path up to reduction order (asserted by
    tests/test_inference.py::test_vit_whole_scene_cp_matches_single_device).

    The token count gh*gw must divide by the axis size — grow the scene to
    the next patch-row multiple if needed (the padding is image content via
    reflect, same as the patch-grid padding `vit_whole_scene` already does).
    """
    h, w, c = scene.shape
    ph = -(-h // patch_size) * patch_size
    pw = -(-w // patch_size) * patch_size
    padded = np.pad(scene, ((0, ph - h), (0, pw - w), (0, 0)), mode="reflect")
    gh, gw = ph // patch_size, pw // patch_size
    n_shards = int(mesh.shape[axis_name])
    if (gh * gw) % n_shards:
        raise ValueError(
            f"token grid {gh}x{gw}={gh * gw} does not divide by mesh axis "
            f"{axis_name!r}={n_shards}; pad the scene so the patch grid is a "
            f"multiple of the ring size"
        )

    encode = _scene_encoder_cp(mesh, axis_name, patch_size, dim, depth, heads,
                               mlp_dim, dim_head, dtype, gh, gw)
    return encode(encoder_params, jnp.asarray(padded[None], dtype))


@functools.lru_cache(maxsize=8)
def _scene_encoder_cp(mesh, axis_name, patch_size, dim, depth, heads, mlp_dim,
                      dim_head, dtype, gh, gw):
    """Jitted CP scene encoder, cached per (mesh, architecture, grid) like
    `_scene_encoder` — rebuilding the shard_map closure per call would pay a
    full remote compile for every scene of a repeated size."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .models.vit import Transformer

    transformer = Transformer(dim, depth, heads, dim_head, mlp_dim, dtype,
                              ring_axis=axis_name)
    tok_spec = P(None, axis_name, None)

    ring = shard_map(
        lambda pp, t: transformer.apply({"params": pp}, t),
        mesh=mesh,
        in_specs=(P(), tok_spec),
        out_specs=tok_spec,
        # the per-ring-step pallas_call cannot annotate varying mesh axes on
        # its outputs (same check_rep situation as ops/ring_attention)
        check_rep=False,
    )

    @jax.jit
    def encode(p, x):
        tokens = _embed_scene_tokens(p, x, patch_size, dtype, gh, gw)
        tokens = jax.lax.with_sharding_constraint(
            tokens, NamedSharding(mesh, tok_spec)
        )
        return ring(p["transformer"], tokens)

    return encode


def load_variables(checkpoint: str, model, config: dict, example_shape) -> dict:
    """orbax dir, torch .pt (auto-converted), or fresh init for smoke runs."""
    rng = jax.random.PRNGKey(0)
    if not checkpoint:
        return model.init(rng, jnp.zeros(example_shape), train=False)
    p = Path(checkpoint)
    if p.suffix in (".pt", ".pth"):
        from .convert import convert

        return convert(str(p), config.get("method", "snunet"))
    if not p.exists():
        # fresh init is the documented behavior of checkpoint="" ONLY — a
        # typo'd explicit path must not produce a confident garbage mask
        raise FileNotFoundError(f"checkpoint {checkpoint!r} does not exist")
    from .ops import optim
    from .training.checkpoint import CheckpointManager
    from .training.state import create_train_state

    tx = optim.create_optimizer(config, config.get("model_config", {}), "segmentation")
    state, _ = create_train_state(model, tx, rng, (jnp.zeros(example_shape),))
    mgr = CheckpointManager(p.parent)
    state, _ = mgr.restore(p.name, state)
    out = {"params": state.params}
    if state.batch_stats:
        out["batch_stats"] = state.batch_stats
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description="Scene inference (flood mapping)")
    ap.add_argument("--vv", required=True, help="VV backscatter raster (tif)")
    ap.add_argument("--vh", required=True, help="VH backscatter raster (tif)")
    ap.add_argument("--checkpoint", default="", help="orbax checkpoint or torch .pt")
    ap.add_argument("--method", default="unet")
    ap.add_argument("--out", default="flood_mask.png")
    ap.add_argument("--overlap", type=int, default=32)
    ap.add_argument("--config_root", default="configs")
    args = ap.parse_args(argv)

    cfg = load_config(method=args.method, config_root=args.config_root,
                      overrides={"inputs": ["post_event"]})
    from .data.tiles import _imread, stack_channels

    vv, vh = _imread(args.vv), _imread(args.vh)
    scene = stack_channels(vv, vh, cfg["channels"], cfg.get("clamp_input"))
    scene = normalize(scene, cfg["data_mean"], cfg["data_std"])

    model = initialize_segmentation_model(cfg, cfg["model_config"])
    variables = load_variables(args.checkpoint, model, cfg, (1, 224, 224, scene.shape[-1]))
    predictor = TilePredictor(model, variables)
    mask = predict_scene(predictor, scene, overlap=args.overlap)

    import cv2

    from .utils.visualize import overlay_mask, sar_to_rgb

    cv2.imwrite(str(Path(args.out).with_suffix(".mask.png")), mask)
    rgb = overlay_mask(sar_to_rgb(scene), mask)
    cv2.imwrite(args.out, rgb[..., ::-1])
    h, w = mask.shape
    counts = {int(k): int(v) for k, v in zip(*np.unique(mask, return_counts=True))}
    print(f"scene {h}x{w}; class pixel counts: {counts}; wrote {args.out}")


if __name__ == "__main__":
    main()
