"""Overlap-tiled sliding-window inference for arbitrary volume sizes.

The reference ran whole volumes through the net at native resolution
(script/predict.py:152-172), which at full scan sizes explodes activation
memory. This is the volumetric analog of long-context tiling: fixed-size
windows (one XLA compile, static shapes) slide over the volume with
overlap, predictions blended by a per-tile weight map over a coverage
map. BASELINE.json names overlap-tiled inference as a target capability.

Blending modes:
  * ``gaussian`` (default) — tiles weighted by a separable Gaussian
    centered in the window (sigma = window/8, the nnU-Net convention), so
    voxels near tile borders — where the network has the least context —
    defer to the neighboring tile's center. Visibly removes seam
    artifacts at tile boundaries.
  * ``uniform`` — plain averaging over the coverage count.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np

BLEND_MODES = ("gaussian", "uniform")


def _window_starts(size: int, window: int, stride: int) -> List[int]:
    """Start offsets covering [0, size) with the last window right-aligned."""
    if size <= window:
        return [0]
    starts = list(range(0, size - window + 1, stride))
    if starts[-1] != size - window:
        starts.append(size - window)
    return starts


def _tile_weight(window_size: Sequence[int], blend: str) -> np.ndarray:
    """(wd, wh, ww, 1) float32 blending weight for one tile."""
    if blend not in BLEND_MODES:
        raise ValueError(f"blend must be one of {BLEND_MODES}, got {blend!r}")
    wd, wh, ww = (int(x) for x in window_size)
    if blend == "uniform":
        return np.ones((wd, wh, ww, 1), np.float32)
    axes = []
    for n in (wd, wh, ww):
        x = np.arange(n, dtype=np.float64)
        center = (n - 1) / 2.0
        sigma = max(n / 8.0, 1.0)  # nnU-Net's sigma_scale = 1/8
        axes.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    w = axes[0][:, None, None] * axes[1][None, :, None] * axes[2][None, None, :]
    # floor keeps border voxels (covered by a single tile) numerically sane
    w = np.maximum(w, 1e-4 * w.max())
    return w[..., None].astype(np.float32)


def sliding_window_predict(
    predict_fn: Callable[[np.ndarray], np.ndarray],
    image: np.ndarray,
    window_size: Sequence[int] = (128, 128, 128),
    overlap: float = 0.5,
    pad_value: float = 0.0,
    blend: str = "gaussian",
) -> np.ndarray:
    """Tiled prediction over a (D, H, W, C) volume.

    Args:
      predict_fn: maps a (1, wd, wh, ww, C) window to (1, wd, wh, ww, K)
        probabilities (already sigmoided). Called with a single static
        window shape → one jit compile.
      image: (D, H, W, C) host array.
      window_size: (wd, wh, ww) tile.
      overlap: fraction of window overlapped between neighboring tiles
        (0 <= overlap < 1).
      blend: 'gaussian' (center-weighted, seam-free) or 'uniform'.

    Returns:
      (D, H, W, K) blended probabilities.
    """
    if not 0.0 <= overlap < 1.0:
        raise ValueError(f"overlap must be in [0, 1), got {overlap}")
    image = np.asarray(image)
    if image.ndim != 4:
        raise ValueError(f"expected (D,H,W,C) image, got shape {image.shape}")

    d, h, w, _ = image.shape
    wd, wh, ww = (int(x) for x in window_size)

    # pad up to window size if the volume is smaller than one tile
    pad = [max(0, wd - d), max(0, wh - h), max(0, ww - w)]
    if any(pad):
        image = np.pad(
            image,
            [(0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)],
            constant_values=pad_value,
        )
    pd, ph, pw, _ = image.shape

    strides = [max(1, int(round(x * (1.0 - overlap)))) for x in (wd, wh, ww)]
    starts = (
        _window_starts(pd, wd, strides[0]),
        _window_starts(ph, wh, strides[1]),
        _window_starts(pw, ww, strides[2]),
    )

    weight = _tile_weight((wd, wh, ww), blend)
    accum = None
    counts = np.zeros((pd, ph, pw, 1), dtype=np.float32)
    for z0 in starts[0]:
        for y0 in starts[1]:
            for x0 in starts[2]:
                tile = image[z0 : z0 + wd, y0 : y0 + wh, x0 : x0 + ww, :]
                probs = np.asarray(predict_fn(tile[None]))[0]
                if accum is None:
                    accum = np.zeros(
                        (pd, ph, pw, probs.shape[-1]), dtype=np.float32
                    )
                accum[z0 : z0 + wd, y0 : y0 + wh, x0 : x0 + ww, :] += (
                    probs * weight
                )
                counts[z0 : z0 + wd, y0 : y0 + wh, x0 : x0 + ww, :] += weight
    out = accum / np.maximum(counts, 1e-8)
    return out[:d, :h, :w, :]


def make_device_sliding_window(
    apply_fn: Callable,
    volume_shape: Tuple[int, int, int],
    n_channels: int,
    n_out: int,
    window_size: Sequence[int] = (128, 128, 128),
    overlap: float = 0.5,
    blend: str = "gaussian",
    tile_batch: int = 1,
    mesh=None,
):
    """Build a fully on-device tiled predictor: one jit, zero per-tile D2H.

    The host-loop variant transfers every tile's probabilities back for
    blending — fine locally, but on tunneled TPU backends D2H dominates
    (measured 12.3 s vs ~0.5 s of compute for a 160³ volume). Here the
    tile grid is unrolled at trace time with STATIC start offsets —
    driving it from a ``lax.scan`` over traced offsets measured 6× slower
    (3.0 vs 0.48 s/vol at 160³): dynamic offsets defeat XLA's in-place
    updates and scheduling. ``tile_batch`` groups tiles through the net
    together (static stacked slices), which shrinks the number of network
    instances in the program (compile time) and feeds the MXU bigger
    batches. Accumulation + weight-normalization happen on device; exactly
    one array comes back.

    With ``mesh`` (a ``jax.sharding.Mesh`` with a 'data' axis), the tile
    batch is sharded over the mesh's data axis — tiles are embarrassingly
    parallel, so sliding-window serving scales across chips with zero
    collectives beyond the final gather: each device runs the full net on
    its shard of the tile group. ``tile_batch`` is then rounded up to a
    multiple of the data-axis size.

    Returns ``run(variables, image) -> (D, H, W, n_out) probabilities``
    (jitted; image may be smaller than one window — it is padded and the
    result cropped).
    """
    import jax
    import jax.numpy as jnp

    if not 0.0 <= overlap < 1.0:
        raise ValueError(f"overlap must be in [0, 1), got {overlap}")
    if tile_batch < 1:
        raise ValueError(f"tile_batch must be >= 1, got {tile_batch}")
    n_data = 1
    if mesh is not None:
        from pcmseg_tpu.parallel.sharding import DATA_AXIS

        n_data = mesh.shape[DATA_AXIS]
        tile_batch = max(tile_batch, n_data)
        tile_batch += (-tile_batch) % n_data
    d, h, w = (int(s) for s in volume_shape)
    wd, wh, ww = (int(x) for x in window_size)
    pd, ph, pw = max(d, wd), max(h, wh), max(w, ww)

    strides = [max(1, int(round(x * (1.0 - overlap)))) for x in (wd, wh, ww)]
    starts = [
        (z0, y0, x0)
        for z0 in _window_starts(pd, wd, strides[0])
        for y0 in _window_starts(ph, wh, strides[1])
        for x0 in _window_starts(pw, ww, strides[2])
    ]
    weight = _tile_weight((wd, wh, ww), blend)
    counts = np.zeros((pd, ph, pw, 1), dtype=np.float32)
    for z0, y0, x0 in starts:
        counts[z0 : z0 + wd, y0 : y0 + wh, x0 : x0 + ww, :] += weight

    # every group is exactly b tiles: a ragged last group would trace the
    # network at a SECOND batch size (defeating the compile-size win
    # batching exists for), and under a mesh the batch axis must divide
    # n_data. Pad with repeats of the first start, skipped at scatter time
    # (static offsets → the skip is free).
    b = tile_batch if mesh is not None else min(tile_batch, len(starts))
    n_pad = (-len(starts)) % b
    padded_starts = [(s, True) for s in starts] + [(starts[0], False)] * n_pad
    groups = [padded_starts[i : i + b] for i in range(0, len(padded_starts), b)]

    @jax.jit
    def run(variables, image):
        if image.shape != (d, h, w, n_channels):
            raise ValueError(
                f"expected image {(d, h, w, n_channels)}, got {image.shape}"
            )
        padded = jnp.pad(
            image, ((0, pd - d), (0, ph - h), (0, pw - w), (0, 0))
        )
        accum = jnp.zeros((pd, ph, pw, n_out), jnp.float32)
        w_tile = jnp.asarray(weight)
        for group in groups:
            tiles = jnp.stack(
                [
                    padded[z0 : z0 + wd, y0 : y0 + wh, x0 : x0 + ww, :]
                    for (z0, y0, x0), _ in group
                ]
            )
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                from pcmseg_tpu.parallel.sharding import DATA_AXIS

                tiles = jax.lax.with_sharding_constraint(
                    tiles, NamedSharding(mesh, PartitionSpec(DATA_AXIS))
                )
            probs = apply_fn(variables, tiles).astype(jnp.float32)
            # overlapping windows scatter-add serially (static offsets);
            # padding tiles are simply skipped
            for j, ((z0, y0, x0), real) in enumerate(group):
                if not real:
                    continue
                window = jax.lax.dynamic_slice(
                    accum, (z0, y0, x0, 0), (wd, wh, ww, n_out)
                )
                accum = jax.lax.dynamic_update_slice(
                    accum, window + probs[j] * w_tile, (z0, y0, x0, 0)
                )
        out = accum / jnp.maximum(jnp.asarray(counts), 1e-8)
        return out[:d, :h, :w, :]

    return run


def grid_shape(
    volume_shape: Tuple[int, int, int],
    window_size: Sequence[int],
    overlap: float,
) -> Tuple[int, int, int]:
    """Number of tiles per axis (for progress reporting / cost estimates)."""
    strides = [max(1, int(round(x * (1.0 - overlap)))) for x in window_size]
    return tuple(
        len(_window_starts(max(s, w), w, st))
        for s, w, st in zip(volume_shape, window_size, strides)
    )
