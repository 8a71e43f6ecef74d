"""Device-resident dataset cache: batches assembled ON the TPU.

The end-to-end profile (BENCH.md "End-to-end training throughput") shows
the training loop is host→device-transfer-bound: the 128³ step computes
in ~1.1 s while each batch streams for ~2-3 s, even in bf16 with
concurrent transfers. For datasets that fit HBM alongside the training
step (the reference's whole BPH cohort is ~240 cases ≈ 5.5 GB in
bf16+uint8; typical fold subsets far less), the TPU-native answer is to
upload every preprocessed case ONCE and never stream again:

  * the full (N, D, H, W, C) bf16 image stack and (N, D, H, W, 1) uint8
    label stack live in HBM as ordinary jax.Arrays;
  * each step receives only a (B,) int32 index vector (+ (B,) weights and
    a PRNG key) — a few hundred bytes — and gathers its batch with
    ``jnp.take`` inside the jitted step;
  * data augmentation runs on device (flips / H-W rot90 / intensity
    jitter as ``jnp.where``-selected reversals and transposes — memory
    ops, negligible next to the convs), so cached training still sees
    fresh augmentation every epoch.

Scope: meshes of any shape, single- OR multi-process. On multi-device
meshes the stacks shard over ('data' × case axis, 'spatial' × D axis) —
per-device cost is total/(dp·sp) and the in-step gather's cross-shard
traffic rides ICI (or DCN across hosts) via GSPMD-inserted collectives
(still orders of magnitude faster than host streaming + H2D every
batch). Multi-host builds the stacks with ``jax.make_array_from_callback``
so each process decodes ONLY the cases its addressable shards cover, and
gathers batches with globally-identical index vectors (the index stream
is a pure function of config.seed — no coordination traffic). The
trainer enables the cache automatically when the per-device share fits
``config.device_data_cache_gb`` (0 disables).

Augmentation parity note: device augmentation draws from the JAX PRNG,
not the host NumPy generator, so a cached run's augmentation stream
differs from a streamed run's — same distribution, different draws.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def dataset_device_bytes(n_cases: int, target_size, n_modalities: int) -> int:
    """HBM footprint of a cached dataset (bf16 images + uint8 labels)."""
    vox = int(np.prod(target_size))
    return n_cases * vox * (2 * n_modalities + 1)


def cache_sharding(mesh):
    """NamedSharding of the cached stacks over a ('data','spatial',...)
    mesh: the case axis shards over 'data' and the volume's D axis over
    'spatial', so no device holds more than total/(dp*sp) bytes and the
    in-step gather's cross-shard traffic rides ICI (GSPMD inserts the
    collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("data", "spatial"))


def build_device_cache(
    dataset,
    num_workers: int = 4,
    mesh=None,
    indices: Optional[Sequence[int]] = None,
) -> Dict[str, object]:
    """Decode every case (threaded, cache-assisted) and upload the stacks.

    Returns {'images': (N,D,H,W,C) bf16 jax.Array, 'labels': (N,D,H,W,1)
    uint8 jax.Array, 'case_ids': [str]} — index i corresponds to
    ``dataset.case_list[i]`` so existing train/val index splits apply
    unchanged. With a ``mesh``, the stacks are sharded per
    :func:`cache_sharding` (the case axis is zero-padded up to a
    data-axis multiple; padded rows are never indexed).

    ``indices`` caches only that SUBSET of cases (the partial device
    cache for cohorts whose full stack exceeds the HBM budget —
    VERDICT round-4 missing #2): stack row r then corresponds to
    ``dataset.case_list[indices[r]]`` and the caller remaps its case
    indices to rows. None (default) caches everything.
    """
    from concurrent.futures import ThreadPoolExecutor

    import ml_dtypes

    if indices is not None:
        dataset = _DatasetView(dataset, indices)

    # memoized per (dataset, mesh shape): CV builds one Trainer per fold
    # over the SAME dataset — the immutable HBM stacks are shared, not
    # re-uploaded (a different mesh needs a different sharding, so it
    # gets its own entry). SUBSET caches are NOT memoized: each fold's
    # resident subset differs, and parking K per-fold stacks in the
    # dataset-lifetime memo would accumulate HBM across folds — the
    # Trainer owns its partial cache and frees it with the fold.
    memo_key = tuple(mesh.shape.items()) if mesh is not None else None
    base = dataset.base if indices is not None else dataset
    memo = getattr(base, "_device_cache_memo", {})
    if indices is None and memo_key in memo:
        return memo[memo_key]

    n = len(dataset)
    multiproc = jax.process_count() > 1

    if multiproc:
        if mesh is None:
            raise ValueError("multi-process device cache requires a mesh")
        cache = _build_multiprocess(dataset, num_workers, mesh)
    else:
        samples: list = [None] * n
        with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
            for i, s in zip(range(n), pool.map(dataset.load_case, range(n))):
                samples[i] = s
        images = np.stack(
            [s["image"] for s in samples]
        ).astype(ml_dtypes.bfloat16)
        labels = np.stack([s["label"] for s in samples]).astype(np.uint8)
        case_ids = [s["case_id"] for s in samples]

        if mesh is not None and int(np.prod(tuple(mesh.shape.values()))) > 1:
            dp = mesh.shape["data"]
            if n % dp:
                pad = dp - n % dp  # may exceed n (tiny cohort, wide mesh)
                images = np.concatenate(
                    [images, np.zeros((pad, *images.shape[1:]), images.dtype)]
                )
                labels = np.concatenate(
                    [labels, np.zeros((pad, *labels.shape[1:]), labels.dtype)]
                )
            sh = cache_sharding(mesh)
            put = lambda a: jax.device_put(a, sh)  # noqa: E731
        else:
            put = jax.device_put
        cache = {
            "images": put(images),
            "labels": put(labels),
            "case_ids": case_ids,
        }
    if indices is None:
        try:
            memo[memo_key] = cache
            base._device_cache_memo = memo
        except AttributeError:
            pass
    return cache


class _DatasetView:
    """Read-only row-subset view of a dataset: row r maps to base case
    ``indices[r]``. Exposes exactly the surface the cache builders use
    (len / load_case / case_ids)."""

    def __init__(self, base, indices: Sequence[int]):
        self.base = base
        self.indices = [int(i) for i in indices]

    def __len__(self) -> int:
        return len(self.indices)

    def load_case(self, i: int):
        return self.base.load_case(self.indices[i])

    @property
    def case_ids(self):
        base_ids = self.base.case_ids
        return [base_ids[i] for i in self.indices]


def _build_multiprocess(dataset, num_workers: int, mesh):
    """Globally-sharded stacks where each process decodes ONLY the cases
    its addressable shards cover.

    ``jax.make_array_from_callback`` asks for one numpy block per
    addressable device shard; the callback decodes the block's case rows
    (memoized per case — a 'spatial'-split D axis requests the same case
    for several shards) and slices out the shard. Padded rows (case axis
    up to a data-axis multiple) are zeros and never indexed. No process
    ever materializes the full stack, and no coordination traffic is
    needed: case discovery is deterministic, so every process sees the
    same global order.
    """
    from concurrent.futures import ThreadPoolExecutor

    import ml_dtypes

    n = len(dataset)
    dp = mesh.shape["data"]
    pad = (dp - n % dp) % dp
    sample0 = dataset.load_case(0)
    img_shape = sample0["image"].shape  # (D,H,W,C)
    lab_shape = sample0["label"].shape  # (D,H,W,1)
    decoded: dict = {0: sample0}

    def get_case(i: int):
        if i not in decoded:
            decoded[i] = dataset.load_case(i)
        return decoded[i]

    sh = cache_sharding(mesh)

    # pre-decode this process's rows concurrently (the callback itself is
    # called serially); rows beyond n are padding
    my_rows = set()
    for d in sh.addressable_devices:
        idx = sh.devices_indices_map((n + pad, *img_shape))[d]
        r = idx[0]
        my_rows.update(
            i for i in range(r.start or 0, min(r.stop or n + pad, n))
        )
    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        for i, s in zip(sorted(my_rows), pool.map(get_case, sorted(my_rows))):
            decoded[i] = s

    def block(key, dtype, index):
        rows = index[0]
        out = []
        for i in range(rows.start or 0, rows.stop or n + pad):
            if i < n:
                arr = np.asarray(get_case(i)[key]).astype(dtype)
            else:
                shape = img_shape if key == "image" else lab_shape
                arr = np.zeros(shape, dtype)
            out.append(arr[index[1:]] if len(index) > 1 else arr)
        return np.stack(out)

    images = jax.make_array_from_callback(
        (n + pad, *img_shape), sh,
        lambda idx: block("image", ml_dtypes.bfloat16, idx),
    )
    labels = jax.make_array_from_callback(
        (n + pad, *lab_shape), sh,
        lambda idx: block("label", np.uint8, idx),
    )
    case_ids = list(dataset.case_ids)
    return {"images": images, "labels": labels, "case_ids": case_ids}


def _affine_warp(
    img: jnp.ndarray,
    lab: jnp.ndarray,
    angle: jnp.ndarray,
    scale: jnp.ndarray,
):
    """Rotate (H-W plane, radians) + isotropically zoom one
    ((D,H,W,C), (D,H,W,1)) pair about the volume center — trilinear for
    the image, nearest for the label, edge-clamped sampling.

    TPU-shaped lowering: the transform FACTORIZES (z depends only on z;
    (y,x) only on (y,x)), so instead of eight full-volume gathers with
    per-voxel 3-D indices (XLA's generic-gather slow path — measured
    ~2x the whole train step at 128³), the warp is a 1-D linear resample
    along z (two ``jnp.take`` with a (D,) index vector) followed by four
    corner gathers over the flattened H·W axis with ONE shared (H·W,)
    index vector for all z-slices and channels. Same math, same result,
    ~10x cheaper on the chip (BENCH.md round-4 "Extended device
    augmentation").
    """
    d, h, w = img.shape[:3]
    zc, yc, xc = (d - 1) / 2.0, (h - 1) / 2.0, (w - 1) / 2.0
    inv = 1.0 / scale
    cos, sin = jnp.cos(angle), jnp.sin(angle)

    # ---- z axis: 1-D linear resample (indices shape (D,)) ---------------
    zz = jnp.arange(d, dtype=jnp.float32)
    # Clamp SOURCE coordinates (not just the floor) so out-of-bounds
    # samples take the edge value — unclamped src<0 would leave the
    # fraction outside [0,1] and linearly EXTRApolate (advisor r4: ±45
    # at faces on a N(0,1) zoom-0.85 volume vs the host twin's ±3.3).
    src_z = jnp.clip((zz - zc) * inv + zc, 0, d - 1)
    z0 = jnp.clip(jnp.floor(src_z), 0, d - 1)
    fz = (src_z - z0)[:, None, None, None]
    z0i = z0.astype(jnp.int32)
    z1i = jnp.minimum(z0i + 1, d - 1)

    # ---- H-W plane: rotation+zoom with one shared (H*W,) index set ------
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    ys, xs = yy - yc, xx - xc
    # Same edge-clamp as the z axis: keep fy/fx in [0,1].
    src_y = jnp.clip((cos * ys + sin * xs) * inv + yc, 0, h - 1)
    src_x = jnp.clip((-sin * ys + cos * xs) * inv + xc, 0, w - 1)
    y0 = jnp.clip(jnp.floor(src_y), 0, h - 1)
    x0 = jnp.clip(jnp.floor(src_x), 0, w - 1)
    fy = src_y - y0
    fx = src_x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    def flat(yi, xi):
        return (yi * w + xi).reshape(-1)

    def plane_lerp(vol):  # vol: (D, H*W, C) f32
        c00 = jnp.take(vol, flat(y0i, x0i), axis=1)
        c01 = jnp.take(vol, flat(y0i, x1i), axis=1)
        c10 = jnp.take(vol, flat(y1i, x0i), axis=1)
        c11 = jnp.take(vol, flat(y1i, x1i), axis=1)
        wy = fy.reshape(1, -1, 1)
        wx = fx.reshape(1, -1, 1)
        c0 = c00 * (1 - wx) + c01 * wx
        c1 = c10 * (1 - wx) + c11 * wx
        return c0 * (1 - wy) + c1 * wy

    x32 = img.astype(jnp.float32)
    # z first (fewer elements before the 4-corner plane pass when
    # zooming out; same result either order — the axes are independent)
    img_z = (
        jnp.take(x32, z0i, axis=0) * (1 - fz)
        + jnp.take(x32, z1i, axis=0) * fz
    )
    out_img = (
        plane_lerp(img_z.reshape(d, h * w, -1))
        .reshape(d, h, w, img.shape[3])
        .astype(img.dtype)
    )

    # label: nearest neighbor along both factors
    zn = jnp.clip(jnp.round(src_z), 0, d - 1).astype(jnp.int32)
    yn = jnp.clip(jnp.round(src_y), 0, h - 1).astype(jnp.int32)
    xn = jnp.clip(jnp.round(src_x), 0, w - 1).astype(jnp.int32)
    lab_z = jnp.take(lab, zn, axis=0)
    out_lab = jnp.take(
        lab_z.reshape(d, h * w, -1), flat(yn, xn), axis=1
    ).reshape(d, h, w, lab.shape[3])
    return out_img, out_lab


def _separable_blur(img: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Gaussian blur with a traced sigma: static 5-tap separable kernel
    whose weights depend on ``sigma`` (radius 2 covers sigma <= ~1.2)."""
    offs = jnp.arange(-2.0, 3.0)
    k = jnp.exp(-0.5 * (offs / jnp.maximum(sigma, 1e-3)) ** 2)
    k = k / jnp.sum(k)
    x = img.astype(jnp.float32)
    for ax in range(3):
        x = jnp.moveaxis(x, ax, -1)
        pad = [(0, 0)] * (x.ndim - 1) + [(2, 2)]
        xp = jnp.pad(x, pad, mode="edge")
        x = sum(
            xp[..., i : i + x.shape[-1]] * k[i] for i in range(5)
        )
        x = jnp.moveaxis(x, -1, ax)
    return x.astype(img.dtype)


def device_augment(
    images: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    flip: bool = True,
    rot90: bool = True,
    intensity_jitter: float = 0.1,
    scale: float = 0.0,
    rotate_deg: float = 0.0,
    gamma: float = 0.0,
    noise: float = 0.0,
    blur_prob: float = 0.0,
):
    """On-device, per-sample augmentation of a (B, D, H, W, C) batch.

    Mirrors data/augment.py's host augmentations (axis flips p=0.5, H-W
    plane 90° rotations — 180° only for non-square H-W, matching the
    host rule — and intensity scale/shift jitter) with jnp ops that XLA
    fuses into the step. Labels follow the spatial ops only.

    Beyond the basic set (all default-off; nnU-Net-style spatial and
    intensity transforms, VERDICT round-3 next #5):
      * ``scale`` s > 0: isotropic zoom by U(1-s, 1+s) (trilinear image,
        nearest label, edge-clamped — combined with the rotation into
        ONE warp pass).
      * ``rotate_deg`` r > 0: arbitrary-angle H-W-plane rotation by
        U(-r, r) degrees.
      * ``gamma`` g > 0: intensity gamma in exp(U(-g, g)) applied on the
        per-sample min-max-normalized scale (preserves the input range).
      * ``noise`` n > 0: additive Gaussian noise, sigma = U(0, n)·std.
      * ``blur_prob`` p: with probability p, separable Gaussian blur
        with sigma ~ U(0.5, 1.1) voxels (5-tap kernel).
    """
    b = images.shape[0]
    square = images.shape[2] == images.shape[3]

    def one(img, lab, k):
        kf, kr, ks, kh, kw, kg, kn, kb = jax.random.split(k, 8)
        if flip:
            flags = jax.random.bernoulli(kf, 0.5, (3,))
            for ax, flag in enumerate(flags):
                img = jnp.where(flag, jnp.flip(img, axis=ax), img)
                lab = jnp.where(flag, jnp.flip(lab, axis=ax), lab)
        if rot90:
            k4 = jax.random.randint(kr, (), 0, 4)
            if not square:
                k4 = k4 - (k4 % 2)  # odd k would swap H/W extents

            def rot(x):
                # k=1: (H,W) -> rot90 == transpose + flip H
                r1 = jnp.flip(jnp.swapaxes(x, 1, 2), axis=1)
                r2 = jnp.flip(jnp.flip(x, axis=1), axis=2)
                r3 = jnp.flip(jnp.swapaxes(x, 1, 2), axis=2)
                return jax.lax.switch(
                    k4, [lambda: x, lambda: r1, lambda: r2, lambda: r3]
                )

            if square:
                img, lab = rot(img), rot(lab)
            else:
                r2i = jnp.flip(jnp.flip(img, axis=1), axis=2)
                r2l = jnp.flip(jnp.flip(lab, axis=1), axis=2)
                img = jnp.where(k4 == 2, r2i, img)
                lab = jnp.where(k4 == 2, r2l, lab)
        if scale > 0 or rotate_deg > 0:
            k1, k2 = jax.random.split(kw)
            ang = (
                jax.random.uniform(
                    k1, (), minval=-rotate_deg, maxval=rotate_deg
                ) * (jnp.pi / 180.0)
                if rotate_deg > 0 else jnp.float32(0.0)
            )
            zoom = (
                1.0 + jax.random.uniform(k2, (), minval=-scale, maxval=scale)
                if scale > 0 else jnp.float32(1.0)
            )
            img, lab = _affine_warp(img, lab, ang, zoom)
        if intensity_jitter > 0:
            sc = 1.0 + jax.random.uniform(
                ks, (), minval=-intensity_jitter, maxval=intensity_jitter
            )
            std = jnp.std(img.astype(jnp.float32))
            shift = jax.random.uniform(
                kh, (), minval=-intensity_jitter, maxval=intensity_jitter
            ) * jnp.where(std > 0, std, 1.0)
            img = (img.astype(jnp.float32) * sc + shift).astype(img.dtype)
        if gamma > 0:
            # gamma on the per-sample min-max-normalized scale, then map
            # back — keeps the (already-normalized) input range intact.
            # The base is clamped away from exact 0: XLA's TPU pow lowers
            # to exp(g*log(base)) inside fused pipelines, which returns
            # NaN at base == 0 (the min voxel, ALWAYS present) — one NaN
            # the next stage's std() then spreads over the whole sample.
            # CPU pow special-cases zero, so only the chip sees it.
            g = jnp.exp(
                jax.random.uniform(kg, (), minval=-gamma, maxval=gamma)
            )
            x = img.astype(jnp.float32)
            lo, hi = jnp.min(x), jnp.max(x)
            span = jnp.maximum(hi - lo, 1e-6)
            base = jnp.maximum((x - lo) / span, 1e-7)
            img = (jnp.power(base, g) * span + lo).astype(img.dtype)
        if noise > 0:
            k1, k2 = jax.random.split(kn)
            sigma = jax.random.uniform(k1, (), maxval=noise) * jnp.maximum(
                jnp.std(img.astype(jnp.float32)), 1e-6
            )
            img = (
                img.astype(jnp.float32)
                + sigma * jax.random.normal(k2, img.shape)
            ).astype(img.dtype)
        if blur_prob > 0:
            k1, k2 = jax.random.split(kb)
            blurred = _separable_blur(
                img, jax.random.uniform(k2, (), minval=0.5, maxval=1.1)
            )
            img = jnp.where(
                jax.random.uniform(k1, ()) < blur_prob, blurred, img
            )
        return img, lab

    keys = jax.random.split(key, b)
    return jax.vmap(one)(images, labels, keys)


def device_random_crop(
    images: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    crop,
    oversample_fg: float = 0.0,
    mode: str = "center",
):
    """Per-sample random (D,H,W) crop of a gathered (B,D,H,W,C) batch —
    the on-device side of config.train_crop (data/augment.py random_crop
    is the streamed-loader twin). Offsets are uniform per sample; image
    and label share them. ``oversample_fg`` > 0 forces some samples'
    crops onto label foreground; small lesions are otherwise missed by
    most uniform crops. A forced sample picks a uniformly-random
    foreground voxel of its label — argmax of iid noise masked to the
    label support, one fused elementwise+reduce pass (~2M voxels at
    128³; measured cost of the whole path is +1.4% step time at 96³
    crops, BENCH.md round-4 crop sweep; the reduce stays live for
    unforced samples too since ``jnp.where`` keeps both branches).
    Empty labels fall back to uniform. Two mechanisms (``mode``):

      * ``'center'`` (nnU-Net semantics, the default): a DETERMINISTIC
        ``B - round(B·(1-p))`` samples of every batch are forced —
        nnU-Net's per-batch fraction rule — and the crop is CENTERED on
        the sampled voxel (offset = voxel − crop//2, clipped to bounds).
      * ``'window'`` (the round-4 variant, kept for A/B): forcing is a
        per-sample Bernoulli(p) draw and the voxel lands uniformly
        anywhere inside the crop window (ADVICE round-3 #2 documented
        the divergence from nnU-Net; BENCH.md round-5 A/Bs the two).

    Static crop shape + traced offsets keep the jitted step shape-stable
    (one compiled program per crop size). Batch rows are shuffled every
    epoch, so 'center' forcing the tail positions does not pin cases."""
    b = images.shape[0]
    dims = images.shape[1:4]
    crop = tuple(crop)
    # nnU-Net forces the last B - round(B·(1-p)) positions of the batch;
    # here padded (zero-weight) rows sit at the TAIL, so the same count
    # is forced at the HEAD instead — rows are shuffled every epoch, so
    # head-vs-tail is immaterial, but head never wastes forcing on pad
    n_forced = b - int(round(b * (1.0 - oversample_fg)))

    def one(img, lab, k, sample_idx):
        ks = jax.random.split(k, 8)
        uni = [
            jax.random.randint(kk, (), 0, s - c + 1)
            for kk, s, c in zip(ks[:3], dims, crop)
        ]
        offs = uni
        if oversample_fg > 0.0:
            mask = lab[..., 0] > 0
            noise = jax.random.uniform(
                ks[3], mask.shape, minval=0.1, maxval=1.0
            )
            flat = jnp.argmax(
                jnp.where(mask, noise, 0.0).reshape(-1)
            )
            vox = jnp.unravel_index(flat, mask.shape)
            if mode == "center":
                forced = sample_idx < n_forced
            else:
                forced = jax.random.uniform(ks[4], ()) < oversample_fg
            use_fg = forced & jnp.any(mask)
            offs = []
            for kk, v, s, c, o_u in zip(ks[5:8], vox, dims, crop, uni):
                if mode == "center":
                    o_fg = jnp.clip(v - c // 2, 0, s - c)
                else:
                    lo = jnp.clip(v - c + 1, 0, s - c)
                    hi = jnp.clip(v, 0, s - c)
                    n = hi - lo + 1
                    u = jax.random.uniform(kk, ())
                    o_fg = lo + jnp.minimum(
                        (u * n.astype(jnp.float32)).astype(jnp.int32), n - 1
                    )
                offs.append(jnp.where(use_fg, o_fg, o_u))
        od, oh, ow = offs
        cd, ch, cw = crop
        img = jax.lax.dynamic_slice(
            img, (od, oh, ow, 0), (cd, ch, cw, img.shape[3])
        )
        lab = jax.lax.dynamic_slice(
            lab, (od, oh, ow, 0), (cd, ch, cw, lab.shape[3])
        )
        return img, lab

    keys = jax.random.split(key, b)
    return jax.vmap(one)(images, labels, keys, jnp.arange(b))


def _batch_constraint(mesh):
    """Constrain gathered batches to the training batch sharding (batch
    over 'data', D over 'spatial') so GSPMD reshards the gather output
    instead of keeping it replicated."""
    if mesh is None:
        return lambda x: x
    from pcmseg_tpu.parallel.sharding import batch_sharding

    def constrain(x):
        return jax.lax.with_sharding_constraint(
            x, batch_sharding(mesh, x.ndim)
        )

    return constrain


def make_cached_train_step(model, config, base_step, mesh=None):
    """Wrap a (state, batch) train step as (state, images, labels, idx,
    weights, key) -> (state, metrics) gathering the batch from the
    device-resident stacks inside jit."""
    use_aug = bool(config.data_augmentation)
    crop = getattr(config, "train_crop", None)
    constrain = _batch_constraint(mesh)

    def step(state, images, labels, idx, weights, key):
        img = constrain(jnp.take(images, idx, axis=0))
        lab = constrain(jnp.take(labels, idx, axis=0))
        if crop is not None:
            key, kc = jax.random.split(key)
            img, lab = device_random_crop(
                img, lab, kc, crop,
                oversample_fg=getattr(config, "oversample_fg", 0.0),
                mode=getattr(config, "oversample_mode", "center"),
            )
            img, lab = constrain(img), constrain(lab)
        if use_aug:
            img, lab = device_augment(
                img,
                lab,
                key,
                flip=config.aug_flip,
                rot90=config.aug_rot90,
                intensity_jitter=config.aug_intensity_jitter,
                scale=getattr(config, "aug_scale", 0.0),
                rotate_deg=getattr(config, "aug_rotate_deg", 0.0),
                gamma=getattr(config, "aug_gamma", 0.0),
                noise=getattr(config, "aug_noise", 0.0),
                blur_prob=getattr(config, "aug_blur_prob", 0.0),
            )
        return base_step(
            state, {"image": img, "label": lab, "weight": weights}
        )

    return step


def make_cached_eval_step(model, config, base_eval, mesh=None):
    """Same gathering wrapper for the eval step (no augmentation)."""
    constrain = _batch_constraint(mesh)

    def step(state, images, labels, idx, weights):
        img = constrain(jnp.take(images, idx, axis=0))
        lab = constrain(jnp.take(labels, idx, axis=0))
        return base_eval(
            state, {"image": img, "label": lab, "weight": weights}
        )

    return step
