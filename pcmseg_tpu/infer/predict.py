"""Predictor: single-case directory ingest → NIfTI segmentation output.

Capability parity with the reference's ModelPredictor + load_multimodal_images
(script/predict.py:8-257):
  * case directory layout: one subdirectory per modality, each holding one
    volume file (predict.py:29-67);
  * missing-modality handling at inference: zero_fill (zeros like the
    reference image), duplicate (reference image stands in), or skip→error
    (predict.py:38-54);
  * unified intensity normalization — the same transform the training
    pipeline applies (fixes the reference's min-max-only-at-predict
    mismatch, SURVEY.md §8.5);
  * prediction → threshold 0.5 → uint8 mask written as NIfTI with the
    spatial metadata copied from the reference modality image
    (predict.py:174-197's CopyInformation);
  * full-volume native-resolution inference, with overlap-tiled
    sliding-window mode for volumes that exceed one window (predict runs
    whole-volume otherwise).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from pcmseg_tpu.core.config import Config, DEFAULT_MODALITIES
from pcmseg_tpu.data.io import ALL_EXTS, read_volume, write_volume
from pcmseg_tpu.data.resample import normalize_intensity, resample_array
from pcmseg_tpu.data.volume import Volume
from pcmseg_tpu.infer.validate import load_model_state
from pcmseg_tpu.models import UNet3D
from pcmseg_tpu.utils.logging import get_logger


def _find_volume_file(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    for f in sorted(os.listdir(directory)):
        if f.lower().endswith(tuple(e.lower() for e in ALL_EXTS)):
            return os.path.join(directory, f)
    return None


def load_multimodal_images(
    case_dir: str,
    modalities: Sequence[str] = DEFAULT_MODALITIES,
    handle_missing: str = "zero_fill",
    normalize: str = "percentile",
    norm_percentiles: Tuple[float, float] = (1.0, 99.0),
    out_dtype=np.float32,
    decode_threads: Optional[int] = None,
    coregister: bool = False,
) -> Tuple[np.ndarray, Volume]:
    """Load a case dir with per-modality subdirs → ((D,H,W,C), reference Volume).

    The first successfully loaded modality becomes the spatial reference;
    all modalities are resampled onto its grid shape if they differ.

    ``out_dtype`` is the stack's dtype: the Predictor passes bfloat16 when
    the network computes in bf16 so each modality is normalized AND cast
    AND stacked in one fused native pass (native/normalize.cpp) — the
    numpy chain here was ~0.9 s/case of the serving host decode
    (BENCH.md configs[4] attribution). float32 (the default, and the
    public-API contract) behaves identically, one cast earlier.

    ``decode_threads`` (default: one per modality, capped at the host's
    cores) parallelizes the per-modality read+normalize work — zlib
    inflation, the native resampler and the fused normalize all release
    the GIL, so a multi-core serving host decodes the 5 modalities
    concurrently; results are deterministic regardless of thread count
    (each modality owns disjoint strided slots of the output stack).
    """
    if decode_threads is None:
        decode_threads = max(1, min(len(modalities), os.cpu_count() or 1))

    def _read(m: str) -> Optional[Volume]:
        path = _find_volume_file(os.path.join(case_dir, m))
        return read_volume(path) if path else None

    if decode_threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=decode_threads) as pool:
            volumes: Dict[str, Optional[Volume]] = dict(
                zip(modalities, pool.map(_read, modalities))
            )
    else:
        volumes = {m: _read(m) for m in modalities}
    reference: Optional[Volume] = next(
        (volumes[m] for m in modalities if volumes[m] is not None), None
    )
    if reference is None:
        raise FileNotFoundError(
            f"no modality volumes found under {case_dir!r} "
            f"(expected subdirs {list(modalities)})"
        )

    from pcmseg_tpu.data.native import native_normalize_into

    n_ch = len(modalities)
    out = np.empty((*reference.shape, n_ch), dtype=out_dtype)

    def _fill(i: int, m: str) -> None:
        vol = volumes[m]
        if vol is None:
            if handle_missing == "zero_fill":
                out[..., i] = 0
                return
            if handle_missing == "duplicate":
                vol = reference
            else:
                raise FileNotFoundError(
                    f"modality {m!r} missing in {case_dir!r} "
                    f"(strategy={handle_missing})"
                )
        if coregister:
            from pcmseg_tpu.data.resample import grids_match, resample_to_grid

            if not grids_match(vol, reference):
                vol = resample_to_grid(vol, reference, mode="linear")
        data = vol.data
        if data.shape != reference.shape:
            data = resample_array(data, reference.shape, mode="linear")
        fused = False
        if normalize in ("percentile", "minmax"):
            p_lo, p_hi = (
                norm_percentiles if normalize == "percentile" else (0.0, 100.0)
            )
            fused = native_normalize_into(
                data, p_lo, p_hi, out, offset=i, stride=n_ch
            )
        if not fused:  # zscore/none modes, exotic dtypes, or no native lib
            out[..., i] = normalize_intensity(data, normalize, norm_percentiles)

    if decode_threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=decode_threads) as pool:
            list(pool.map(lambda im: _fill(*im), enumerate(modalities)))
    else:
        for i, m in enumerate(modalities):
            _fill(i, m)
    return out, reference


def load_multimodal_raw(
    case_dir: str,
    modalities: Sequence[str] = DEFAULT_MODALITIES,
    handle_missing: str = "zero_fill",
    decode_threads: Optional[int] = None,
    coregister: bool = False,
):
    """Device-ingest twin of :func:`load_multimodal_images`: decode +
    (if needed) resample each modality but do NOT normalize, cast, or
    stack on the host — returns ``(channels, reference)`` where
    ``channels`` is a per-modality list of raw (D,H,W) arrays in their
    native dtypes (None = missing under zero_fill). The Predictor
    uploads these and runs percentile-normalize + cast + stack ON the
    chip (config.device_ingest): the raw int16 upload is the same
    2 bytes/voxel as the bf16 wire, and the ~1.2 s/case of host
    normalize+stack work (BENCH.md configs[4] attribution) moves to
    microseconds of device time.
    """
    if decode_threads is None:
        decode_threads = max(1, min(len(modalities), os.cpu_count() or 1))

    def _read(m: str) -> Optional[Volume]:
        path = _find_volume_file(os.path.join(case_dir, m))
        return read_volume(path) if path else None

    if decode_threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=decode_threads) as pool:
            volumes: Dict[str, Optional[Volume]] = dict(
                zip(modalities, pool.map(_read, modalities))
            )
    else:
        volumes = {m: _read(m) for m in modalities}
    reference: Optional[Volume] = next(
        (volumes[m] for m in modalities if volumes[m] is not None), None
    )
    if reference is None:
        raise FileNotFoundError(
            f"no modality volumes found under {case_dir!r} "
            f"(expected subdirs {list(modalities)})"
        )

    def _channel(m: str) -> Optional[np.ndarray]:
        vol = volumes[m]
        if vol is None:
            if handle_missing == "zero_fill":
                return None
            if handle_missing == "duplicate":
                vol = reference
            else:
                raise FileNotFoundError(
                    f"modality {m!r} missing in {case_dir!r} "
                    f"(strategy={handle_missing})"
                )
        if coregister:
            from pcmseg_tpu.data.resample import grids_match, resample_to_grid

            if not grids_match(vol, reference):
                vol = resample_to_grid(vol, reference, mode="linear")
        data = vol.data
        if data.shape != reference.shape:
            data = resample_array(data, reference.shape, mode="linear")
        return np.ascontiguousarray(data)

    return [_channel(m) for m in modalities], reference


def expand_model_paths(checkpoint_path) -> list:
    """One checkpoint spec → ordered list of checkpoint paths.

    Accepts a single path, a comma-separated list, a glob pattern (e.g.
    ``run/best_fold_*`` — Orbax checkpoints are directories, so globs
    match directories too), or a list of any of these. More than one
    path means fold-ensemble serving (see Predictor).
    """
    import glob as _glob

    if isinstance(checkpoint_path, str):
        specs = [p for p in checkpoint_path.split(",") if p]
    else:
        specs = list(checkpoint_path)
    paths = []
    for spec in specs:
        if _glob.has_magic(spec):
            hits = sorted(_glob.glob(spec))
            if not hits:
                raise FileNotFoundError(f"no checkpoints match {spec!r}")
            paths.extend(hits)
        else:
            paths.append(spec)
    return paths


class Predictor:
    """Loads one checkpoint — or a fold ensemble — once; predicts cases.

    ENSEMBLE SERVING (beyond-reference): ``checkpoint_path`` may name
    several checkpoints (comma-separated, a glob like ``best_fold_*``, or
    a list). Cross-validation leaves K per-fold best models behind
    (reference train_bph_cv.py:397-402 — which then never uses them); the
    standard deployment of a CV run in this domain is to average the fold
    models' probabilities. TPU-first shape: the K param trees are stacked
    on a leading axis and the forward is a ``lax.scan`` over that axis
    accumulating the probability mean — one network copy in the compiled
    program, each fold at full single-model speed (measured 1.94× at K=2;
    vmap-over-params measured 8.1× — see the A/B note in __init__). The
    ensemble composes unchanged with BN folding, TTA and sliding-window
    tiling (it lives inside the per-window apply). HBM cost: K× the
    folded params (~0.36 GB per fold at base 64).
    """

    def __init__(
        self,
        config: Config,
        checkpoint_path=None,
        explicit: Sequence[str] = (),
        preloaded=None,
    ):
        """``preloaded=(model, state)`` serves an already-loaded model
        (e.g. the Validator's) through the full predictor pipeline — BN
        folding, TTA, spatial sharding, tiling — without a second
        checkpoint load; otherwise ``checkpoint_path`` (one path, or
        several for an ensemble) is loaded and its meta.json config
        adopted."""
        extra_states = []
        if preloaded is not None:
            self.config = config
            self.log = get_logger("pcmseg.predict")
            self.model, self.state = preloaded
        else:
            from pcmseg_tpu.infer.validate import adopt_checkpoint_config

            if checkpoint_path is None:
                raise ValueError("checkpoint_path or preloaded required")
            paths = expand_model_paths(checkpoint_path)
            # architecture/preprocessing adopted from the first member;
            # the others must be shape-compatible (same training config)
            config = adopt_checkpoint_config(config, paths[0], explicit)
            self.config = config
            self.log = get_logger("pcmseg.predict")
            self.model, self.state = load_model_state(config, paths[0])
            extra_states = [load_model_state(config, p)[1] for p in paths[1:]]
            if extra_states:
                self.log.info(
                    "fold-ensemble serving: %d checkpoints (%s)",
                    len(paths), ", ".join(paths),
                )
        config = self.config
        self._n_ensemble = 1 + len(extra_states)

        if config.fold_bn and config.norm_layer == "batch" and self.state.batch_stats:
            # serving-graph optimization: conv+BN -> conv (infer/fold_bn.py);
            # removes every norm op from the compiled predict program
            from pcmseg_tpu.infer.fold_bn import fold_batchnorm

            serve_model = UNet3D(
                n_modalities=config.n_modalities,
                n_classes=config.n_classes,
                base_features=config.base_features,
                norm_layer="none",
                dtype=self.model.dtype,
                param_dtype=self.model.param_dtype,
                remat=False,
                # fused Pallas conv kernels (TPU only; 1.8-2x on the deep
                # levels — ops/pallas/conv3d.py); the ensemble path keeps
                # XLA convs (Pallas under scan-over-weights is untested,
                # and pallas_inference is off by default with evidence)
                use_pallas=(
                    config.pallas_inference
                    and jax.default_backend() == "tpu"
                    and self._n_ensemble == 1
                ),
            )
            # fold on host (numpy)
            make_vars = lambda st: {  # noqa: E731
                "params": fold_batchnorm(st.params, st.batch_stats)
            }
        else:
            serve_model = self.model

            def make_vars(st):
                v = {"params": st.params}
                if st.batch_stats:
                    v["batch_stats"] = st.batch_stats
                return v

        base_apply = lambda vars_, x: serve_model.apply(  # noqa: E731
            vars_, x, method=UNet3D.predict
        )
        # variables as explicit args (closures would inline them into the
        # compile payload — 360MB at base 64); device_put ONCE (numpy
        # leaves passed as args would re-upload per call)
        if self._n_ensemble > 1:
            # fold ensemble: stack the K param trees on a leading axis and
            # lax.scan the forward over it, accumulating the probability
            # mean — ONE network copy in the compiled program (compile time
            # flat in K) and each iteration runs the fully-fused serving
            # forward at single-model speed. Measured on-chip at
            # 128³/base-64, K=2 (tools/bench_ensemble_serve.py): scan
            # 123.0 ms/vol (1.94× single — the ideal K×), unrolled-K
            # 122.2 ms but K× compile, and vmap-over-params 513.6 ms
            # (8.1×: batching the conv *weights* knocks every conv off
            # XLA's fast path).
            var_list = [make_vars(st) for st in [self.state] + extra_states]
            self._variables = jax.device_put(
                jax.tree.map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]),
                    *var_list,
                )
            )
            n_out = config.n_classes

            def apply(vars_, x):
                init = jnp.zeros((*x.shape[:-1], n_out), jnp.float32)

                def body(acc, v):
                    return acc + base_apply(v, x), None

                total, _ = jax.lax.scan(body, init, vars_)
                return total / self._n_ensemble
        else:
            self._variables = jax.device_put(make_vars(self.state))
            apply = base_apply
        self._spatial_sharded = False
        if config.spatial_parallel > 1:
            # spatially-sharded whole-volume inference: the batch's D axis
            # is sharded over Mesh('spatial') and GSPMD inserts the conv
            # halo exchanges (same mechanism the training path uses,
            # parallel/sharding.py) — volumes too large for one chip's HBM
            # at native resolution run seam-free across chips instead of
            # falling back to overlap tiling. Local devices, single
            # process (a global mesh would hang one-process calls).
            if (
                jax.process_count() == 1
                and len(jax.local_devices()) >= config.spatial_parallel
            ):
                from jax.sharding import NamedSharding, PartitionSpec as P

                from pcmseg_tpu.parallel.sharding import (
                    SPATIAL_AXIS,
                    make_mesh,
                )

                mesh = make_mesh(
                    data_parallel=1,
                    spatial_parallel=config.spatial_parallel,
                    devices=jax.local_devices()[: config.spatial_parallel],
                )
                sharding = NamedSharding(mesh, P(None, SPATIAL_AXIS))
                inner = apply

                def apply(vars_, x, _inner=inner, _s=sharding):  # noqa: E731
                    x = jax.lax.with_sharding_constraint(x, _s)
                    return jax.lax.with_sharding_constraint(_inner(vars_, x), _s)

                self._spatial_sharded = True
            else:
                self.log.warning(
                    "spatial_parallel=%d requested but %d local device(s) "
                    "available in %d process(es); serving unsharded",
                    config.spatial_parallel,
                    len(jax.local_devices()),
                    jax.process_count(),
                )
        if config.tta:
            # flip-ensemble TTA (infer/tta.py): composes with the
            # sliding-window tiling below — each tile is ensembled in place
            from pcmseg_tpu.infer.tta import make_tta_apply

            apply = make_tta_apply(apply)
        self._apply = jax.jit(apply)
        self._predict = lambda x: self._apply(self._variables, x)
        self._sw_fns = {}  # per-volume-shape device sliding-window programs
        self._ingest_fns = {}  # per-(shape,dtypes) device ingest programs

    def predict_probs(self, image: np.ndarray) -> np.ndarray:
        """(D,H,W,C) image → (D,H,W,K) sigmoid probabilities.

        Uses whole-volume inference when the image fits one window,
        sliding-window tiling otherwise (or always when
        config.sliding_window is set).
        """
        return np.asarray(self._predict_probs_device(image))

    def predict_mask(
        self, image: np.ndarray, threshold: Optional[float] = None
    ) -> np.ndarray:
        """(D,H,W,C) image → (D,H,W) uint8 mask, thresholded ON DEVICE.

        The serving path only ever writes the thresholded mask, so
        fetching fp32 probabilities wastes 4× the D2H bytes (24 MB vs
        6 MB per 192×192×160 case) — on a tunneled/remote chip that is
        a measurable share of steady-state serving (BENCH.md
        configs[4] attribution). Callers that need calibrated
        probabilities keep ``predict_probs``.
        """
        threshold = self.config.threshold if threshold is None else threshold
        probs = self._predict_probs_device(image)
        if self.config.n_classes >= 2:
            # multi-class: argmax label map (threshold is binary-only)
            mask = np.asarray(jnp.argmax(probs, axis=-1).astype(jnp.uint8))
        else:
            mask = np.asarray((probs[..., 0] > threshold).astype(jnp.uint8))
        from pcmseg_tpu.infer.postprocess import postprocess_from_config

        return postprocess_from_config(mask, self.config)

    def _cast_wire(self, image):
        # bf16 on the wire — only when the net computes in bf16 (it then
        # casts at its first layer, so rounding here is numerics-identical
        # and halves the H2D transfer); fp32-serving models keep fp32.
        # Device-ingested stacks (jax.Array, already wire-cast on chip)
        # pass through untouched — np.asarray here would round-trip them
        # D2H.
        if isinstance(image, jax.Array):
            return image
        image = np.asarray(image)
        if self.config.compute_dtype == "bfloat16":
            if image.dtype != ml_dtypes.bfloat16:
                image = image.astype(np.float32).astype(ml_dtypes.bfloat16)
        elif image.dtype != np.float32:
            image = image.astype(np.float32)
        return image

    def _device_ingest_stack(self, channels) -> jnp.ndarray:
        """Raw per-modality host arrays → normalized (D,H,W,C) stack ON
        DEVICE (config.device_ingest; VERDICT round-3 next #7).

        Uploads each present channel in its native dtype (int16 costs the
        same 2 B/voxel H2D as the bf16 wire) and runs the percentile /
        minmax / zscore normalization — exactly
        data/resample.py::normalize_intensity's semantics, including the
        clip-then-scale order and the zero-span guard — plus the wire
        cast and the channel stack, in one jitted program per
        (shape, dtypes, presence) signature. jnp.percentile matches
        np.percentile's linear interpolation, so host- and device-ingest
        serving agree to float tolerance
        (tests/test_device_ingest.py)."""
        shape = next(c.shape for c in channels if c is not None)
        present = tuple(c is not None for c in channels)
        key = (
            shape,
            present,
            tuple(str(c.dtype) for c in channels if c is not None),
        )
        if key not in self._ingest_fns:
            mode = self.config.normalize
            p_lo, p_hi = self.config.norm_percentiles
            wire = (
                jnp.bfloat16
                if self.config.compute_dtype == "bfloat16"
                else jnp.float32
            )

            def norm_one(x):
                x = x.astype(jnp.float32)
                if mode == "none":
                    return x
                if mode == "zscore":
                    std = jnp.std(x)
                    return (x - jnp.mean(x)) / jnp.where(std > 0, std, 1.0)
                if mode == "percentile":
                    lo, hi = jnp.percentile(
                        x, jnp.asarray([p_lo, p_hi])
                    )
                    x = jnp.clip(x, lo, hi)
                else:  # minmax
                    lo, hi = jnp.min(x), jnp.max(x)
                denom = hi - lo
                return jnp.where(denom > 0, (x - lo) / denom, 0.0)

            def fn(arrs):
                chans, j = [], 0
                for p in present:
                    if p:
                        chans.append(norm_one(arrs[j]))
                        j += 1
                    else:
                        chans.append(jnp.zeros(shape, jnp.float32))
                return jnp.stack(chans, axis=-1).astype(wire)

            self._ingest_fns[key] = jax.jit(fn)
        return self._ingest_fns[key](
            tuple(c for c in channels if c is not None)
        )

    def _ingest(self, case_dir: str, handle_missing: Optional[str] = None):
        """(image, reference Volume) for one case dir, honoring
        ``config.device_ingest`` (device path) vs the host C++ fused
        normalize (default)."""
        hm = handle_missing or self.config.missing_strategy
        coreg = getattr(self.config, "coregister", False)
        if getattr(self.config, "device_ingest", False):
            channels, reference = load_multimodal_raw(
                case_dir, modalities=self.config.modalities,
                handle_missing=hm, coregister=coreg,
            )
            return self._device_ingest_stack(channels), reference
        image, reference = load_multimodal_images(
            case_dir,
            modalities=self.config.modalities,
            handle_missing=hm,
            normalize=self.config.normalize,
            norm_percentiles=self.config.norm_percentiles,
            out_dtype=self.wire_dtype,
            coregister=coreg,
        )
        return image, reference

    def predict_probs_batch(self, images: np.ndarray) -> np.ndarray:
        """(N,D,H,W,C) window-sized batch → (N,D,H,W,K) probabilities.

        Whole-volume apply only (no tiling) — for callers whose inputs are
        already at a window-fitting shape, e.g. ensemble validation over
        target_size-resampled cases (infer/validate.py)."""
        images = self._cast_wire(images)
        if images.ndim != 5:
            raise ValueError(f"expected (N,D,H,W,C), got {images.shape}")
        return np.asarray(self._predict(images))

    def _predict_probs_device(self, image: np.ndarray) -> jnp.ndarray:
        image = self._cast_wire(image)
        if image.ndim != 4:
            raise ValueError(f"expected (D,H,W,C), got {image.shape}")
        ws = self.config.window_size
        # with spatial sharding active, per-chip memory covers only 1/n of
        # the D axis — the whole-volume path can take volumes n× longer
        # before overlap tiling is needed
        d_cap = ws[0] * (
            self.config.spatial_parallel if self._spatial_sharded else 1
        )
        needs_tiling = self.config.sliding_window or any(
            s > w for s, w in zip(image.shape[:3], (d_cap, ws[1], ws[2]))
        )
        if needs_tiling:
            # fully on-device tiling: one jitted program, one D2H transfer
            from pcmseg_tpu.infer.sliding_window import (
                make_device_sliding_window,
            )

            key = image.shape
            if key not in self._sw_fns:
                # on a multi-chip host, shard the tile batch over the
                # 'data' mesh axis — tiles are embarrassingly parallel.
                # LOCAL devices only, and never under jax.distributed: a
                # global mesh would demand collective participation from
                # processes that aren't running this predict call.
                mesh = None
                if (
                    jax.process_count() == 1
                    and len(jax.local_devices()) > 1
                    and not self._spatial_sharded
                ):
                    # with spatial sharding active the inner apply already
                    # constrains to its own device subset — a second mesh
                    # over ALL local devices inside the same program would
                    # be an incompatible device assignment (jit rejects
                    # mixed assignments), so tiles then run unsharded
                    # through the spatially-sharded net instead
                    from pcmseg_tpu.parallel.sharding import make_mesh

                    mesh = make_mesh(
                        data_parallel=-1, devices=jax.local_devices()
                    )
                self._sw_fns[key] = make_device_sliding_window(
                    self._apply,
                    image.shape[:3],
                    n_channels=image.shape[-1],
                    n_out=self.config.n_classes,
                    window_size=ws,
                    overlap=self.config.window_overlap,
                    blend=self.config.window_blend,
                    tile_batch=self.config.window_tile_batch,
                    mesh=mesh,
                )
            return self._sw_fns[key](self._variables, image)
        return self._predict(image[None])[0]

    @property
    def wire_dtype(self):
        """Host-side stack dtype: bf16 when the net computes in bf16 (the
        first layer casts anyway, so normalizing straight to bf16 is
        numerics-identical and halves host RAM + H2D bytes)."""
        return (
            ml_dtypes.bfloat16
            if self.config.compute_dtype == "bfloat16"
            else np.float32
        )

    def predict_case(
        self, case_dir: str, handle_missing: Optional[str] = None
    ) -> Tuple[np.ndarray, Volume]:
        """Case dir → (probabilities (D,H,W,K), reference Volume)."""
        image, reference = self._ingest(case_dir, handle_missing)
        return self.predict_probs(image), reference

    def save_prediction(
        self,
        probs: np.ndarray,
        reference: Volume,
        output_path: str,
        threshold: Optional[float] = None,
    ) -> str:
        """Threshold (binary) or argmax (multi-class) → uint8 mask/label
        map → NIfTI/MHA with copied spatial metadata."""
        threshold = self.config.threshold if threshold is None else threshold
        if self.config.n_classes >= 2:
            mask = np.argmax(probs, axis=-1).astype(np.uint8)
        else:
            mask = (probs[..., 0] > threshold).astype(np.uint8)
        from pcmseg_tpu.infer.postprocess import postprocess_from_config

        mask = postprocess_from_config(mask, self.config)
        return self.save_mask(mask, reference, output_path)

    def save_mask(
        self, mask: np.ndarray, reference: Volume, output_path: str
    ) -> str:
        """(D,H,W) uint8 mask → NIfTI/MHA with copied spatial metadata."""
        out = Volume(mask).copy_information(
            reference if mask.shape == reference.shape else Volume(mask)
        )
        output_path = os.path.abspath(output_path)
        out_dir = os.path.dirname(output_path)
        os.makedirs(out_dir, exist_ok=True)
        # atomic: the output's existence doubles as the serve loop's
        # completion marker, so a crash mid-write must not leave a
        # truncated file posing as done. The tmp name keeps the original
        # basename as its suffix so write_volume's format detection works.
        tmp_path = os.path.join(
            out_dir, f".tmp-{os.getpid()}-{os.path.basename(output_path)}"
        )
        try:
            write_volume(out, tmp_path)
            os.replace(tmp_path, output_path)
        finally:
            if os.path.exists(tmp_path):
                os.remove(tmp_path)
        self.log.info("prediction written to %s", output_path)
        return output_path

    def predict_and_save(
        self, case_dir: str, output_path: str, threshold: Optional[float] = None
    ) -> str:
        image, reference = self._ingest(case_dir)
        mask = self.predict_mask(image, threshold)
        return self.save_mask(mask, reference, output_path)
