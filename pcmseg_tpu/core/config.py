"""Typed configuration with the reference's preset surface.

Capability parity with the reference's dict-merge preset system
(``/root/reference/test/config_example.py:25-190``): presets
``quick / standard / cross_validation / high_performance / small_dataset``
with keyword-override semantics via :func:`get_config`.

Differences from the reference (deliberate, per SURVEY.md §8):
  * One typed dataclass instead of loose dicts; every field is load-bearing
    (the reference's decorative MODEL/OPTIMIZER/SCHEDULER/LOSS/AUGMENTATION
    blocks are wired here for real).
  * A single intensity-normalization switch applied identically at train,
    validation, and prediction time (the reference normalized only at
    predict time — ``script/predict.py:72-75`` vs ``script/data_loader.py:240``).
  * TPU-first fields: compute dtype policy, mesh shape, remat, prefetch.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

# The five standard modalities, in channel order
# (reference: script/data_loader.py:47).
DEFAULT_MODALITIES: Tuple[str, ...] = (
    "ADC",
    "DWI",
    "gaoqing-T2",
    "T2 fs",
    "T2 not fs",
)

MISSING_STRATEGIES = ("zero_fill", "skip", "duplicate")
NORMALIZE_MODES = ("percentile", "minmax", "zscore", "none")
# smallest legal model input per spatial dim: the 4-level U-Net halves
# each dim four times (2^4), so anything smaller floors to an EMPTY
# bottleneck tensor (torch errors; here BatchNorm over zero elements
# yields NaN *gradients* while the forward stays finite — worse).
MIN_INPUT_SIZE = 16
LOSSES = ("dice", "bce_dice", "tversky", "focal", "focal_dice")
NORM_LAYERS = ("batch", "group", "none")


@dataclass
class Config:
    """Full training/inference configuration.

    Field defaults mirror the reference's BASE_CONFIG / OPTIMIZER_CONFIG /
    SCHEDULER_CONFIG values (test/config_example.py:25-116) where they exist,
    and sane TPU-first values where the reference had none.
    """

    # ---- data -------------------------------------------------------------
    data_dir: str = "data"
    data_type: str = "BPH"  # 'BPH' | 'PCA'
    modalities: Tuple[str, ...] = DEFAULT_MODALITIES
    missing_strategy: str = "zero_fill"  # 'zero_fill' | 'skip' | 'duplicate'
    target_size: Tuple[int, int, int] = (128, 128, 128)  # (D, H, W)
    normalize: str = "percentile"  # percentile-clipped min-max by default
    norm_percentiles: Tuple[float, float] = (1.0, 99.0)
    # physical-space modality co-registration (beyond-reference): resample
    # every modality and the label onto the anchor (first available)
    # modality's grid by physical coordinates (origin/spacing/direction)
    # before the index-space resize — data/resample.py::resample_to_grid.
    # The reference stacks independently-resampled arrays and silently
    # assumes voxel-aligned grids (data_loader.py:352-377); leave False
    # for parity with it.
    coregister: bool = False
    # Preprocessing cache. Default 'auto' resolves to $PCMSEG_CACHE_DIR or
    # ~/.cache/pcmseg/preproc (keys are content-aware: case paths, mtimes,
    # target size, normalization — stale entries can't be served). The
    # cache is load-bearing for TPU throughput: the measured end-to-end
    # train loop at 128³ runs 6x slower re-decoding every epoch (BENCH.md
    # "End-to-end training throughput"). None/'' disables.
    cache_dir: Optional[str] = "auto"
    prefetch: int = 2  # device prefetch depth (double buffering)
    # Device-resident dataset cache (single-process, single-chip meshes):
    # when the whole preprocessed dataset (bf16 images + uint8 labels)
    # fits this HBM budget, the trainer uploads it once and gathers
    # batches on device — no per-epoch host->device streaming, with
    # augmentation applied on device (data/device_cache.py). 0 disables.
    device_data_cache_gb: float = 4.0
    # Partial device cache: when the cohort exceeds device_data_cache_gb,
    # keep the subset that fits resident in HBM (train cases first) and
    # stream only the remainder each epoch, with streamed batches
    # interleaved into the cached dispatch order so their H2D transfers
    # overlap cached-step compute (VERDICT round-4 missing #2 — the
    # all-or-nothing cache dropped reference-scale cohorts to the ~0.5x
    # streaming rate). False restores all-or-nothing.
    device_cache_partial: bool = True
    # Host-RAM memo for the partial cache's STREAMED remainder (wire
    # format, ~23 MB per 128³ case): avoids the per-epoch .npz re-decode
    # that competes with the dispatch thread for CPU. Budget in GB of
    # host RAM; 0 disables (cases then re-decode every epoch).
    stream_host_cache_gb: float = 4.0
    shuffle_buffer_seed: int = 0

    # ---- training ---------------------------------------------------------
    num_epochs: int = 100
    batch_size: int = 1
    # gradient accumulation: batch_size must be divisible by accum_steps;
    # each step scans accum_steps microbatches of batch_size/accum_steps,
    # averaging gradients before one optimizer update. Lets the
    # high_performance batch-4 config run within 16 GB HBM (BENCH.md).
    accum_steps: int = 1
    learning_rate: float = 1e-4
    validation: bool = True
    val_fraction: float = 0.2
    seed: int = 42

    # optimizer (reference OPTIMIZER_CONFIG, config_example.py:99-105)
    optimizer: str = "adam"
    weight_decay: float = 1e-5
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    grad_clip_norm: float = 1.0  # reference train_bph.py:166

    # LR scheduler (reference SCHEDULER_CONFIG, config_example.py:108-116).
    # 'reduce_on_plateau' is the reference-parity default; 'cosine' and
    # 'poly' are metric-independent epoch decays (train/schedule.py), and
    # 'constant' holds learning_rate for A/B runs. All honor warmup_epochs.
    scheduler: str = "reduce_on_plateau"
    plateau_mode: str = "min"
    plateau_factor: float = 0.5
    plateau_patience: int = 10
    plateau_threshold: float = 1e-4
    plateau_cooldown: int = 0
    min_lr: float = 1e-7
    warmup_epochs: int = 0  # linear LR ramp over the first N epochs
    poly_power: float = 0.9  # 'poly' decay exponent (nnU-Net's default)

    # early stopping (BASE_CONFIG patience=15; high_performance=20)
    early_stopping: bool = True
    patience: int = 15

    # EMA (Polyak) weight averaging — beyond-reference. ema_decay > 0
    # keeps an exponential moving average of the params, updated inside
    # the jitted train step (one fused elementwise pass; measured cost in
    # BENCH.md) with tf-style warmup min(decay, (1+t)/(10+t)) so early
    # epochs aren't anchored to the random init. Validation, 'best'
    # selection, checkpoints, and serving then use the averaged weights
    # (ema_eval=False keeps evaluating the live weights instead). 0 = off.
    ema_decay: float = 0.0
    ema_eval: bool = True

    # cross validation
    n_splits: int = 5
    stratified: bool = False  # reserved; reference's flag was decorative

    # data augmentation (wired for real — SURVEY.md §8.11; train split only)
    data_augmentation: bool = False
    aug_flip: bool = True
    aug_rot90: bool = True
    aug_intensity_jitter: float = 0.1
    # extended nnU-Net-style augmentation (device-cache path, all
    # default-off; data/device_cache.py::device_augment): isotropic zoom
    # U(1±aug_scale), arbitrary H-W rotation U(±aug_rotate_deg)°, gamma
    # exp(U(±aug_gamma)), additive noise sigma U(0,aug_noise)·std, and
    # Gaussian blur with probability aug_blur_prob. The streamed-loader
    # host path applies the same transforms via scipy (data/augment.py).
    aug_scale: float = 0.0
    aug_rotate_deg: float = 0.0
    aug_gamma: float = 0.0
    aug_noise: float = 0.0
    aug_blur_prob: float = 0.0
    # patch training (beyond-reference, nnU-Net-style): train on random
    # (D,H,W) crops of the target_size volumes — an aggressive spatial
    # regularizer that also cuts per-step FLOPs/memory ~(crop/target)³,
    # e.g. 64³ crops of 128³ volumes are an 8× lighter step. Validation
    # and serving stay at full size (the net is fully convolutional).
    # Device-cached runs crop on the TPU inside the jitted step
    # (data/device_cache.py), streamed runs on the host (data/augment.py).
    train_crop: Optional[Tuple[int, int, int]] = None
    # probability that a training crop is forced to contain a foreground
    # voxel (nnU-Net oversamples lesion patches at 1/3 — uniform crops
    # mostly miss small lesions). Only acts with train_crop set; empty
    # labels fall back to uniform offsets.
    oversample_fg: float = 0.0
    # forcing mechanism: 'center' = nnU-Net semantics (a deterministic
    # B−round(B·(1−p)) samples per batch, crop CENTERED on a sampled
    # foreground voxel); 'window' = the round-4 variant (per-sample
    # Bernoulli(p), voxel uniform anywhere in the window) kept for A/B —
    # BENCH.md round-5 records the comparison.
    oversample_mode: str = "center"

    # ---- model ------------------------------------------------------------
    n_modalities: int = 5
    n_classes: int = 1  # sigmoid binary everywhere (SURVEY.md §8.4)
    base_features: int = 64
    norm_layer: str = "batch"  # 'batch' | 'group'
    group_norm_groups: int = 8
    # deep supervision (beyond-reference, nnU-Net-style): 1×1×1 aux heads
    # on the 1/2, 1/4, 1/8 decoder levels; the train step applies the loss
    # at every scale with geometric weights (train/steps.py DS_WEIGHTS).
    # Inference graphs are unchanged — the aux outputs are dead code XLA
    # eliminates when train=False.
    deep_supervision: bool = False

    # ---- loss -------------------------------------------------------------
    loss: str = "dice"  # all reference trainers use plain DiceLoss
    dice_smooth: float = 1.0  # utils/losses.py:33
    bce_weight: float = 0.5  # also the focal term's weight under 'focal_dice'
    dice_weight: float = 0.5
    # beyond-reference imbalance losses (ops/losses.py): Tversky FP/FN
    # trade-off and focal focusing parameters
    tversky_alpha: float = 0.3
    tversky_beta: float = 0.7
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25

    # ---- checkpointing / artifacts -----------------------------------------
    save_dir: str = "checkpoints"
    save_frequency: int = 10
    keep_checkpoints: int = 3
    resume: bool = False  # real resume (reference claimed, never implemented)

    # ---- logging / profiling ------------------------------------------------
    log_frequency: int = 1
    print_frequency: int = 10
    # write a jax.profiler trace of `profile_steps` training steps (skipping
    # the compile step) into this directory; None disables
    profile_dir: Optional[str] = None
    profile_steps: int = 5

    # ---- TPU / parallelism --------------------------------------------------
    compute_dtype: str = "bfloat16"  # activations/conv compute
    param_dtype: str = "float32"  # params + BN stats stay fp32
    remat: bool = True  # rematerialize DoubleConv blocks
    # training-path conv lowering: 'auto' picks the measured-best form per
    # shape (im2col matmul at the bottleneck, ops/im2col.py; hybrid
    # custom-VJP where its dW lowering wins, ops/hybrid_conv.py), 'lax'
    # forces nn.Conv everywhere, 'im2col'/'hybrid'/'hybrid_pallas' force
    # one lowering for A/B measurement
    conv_lowering: str = "auto"
    data_parallel: int = -1  # -1 = all devices on the 'data' mesh axis
    spatial_parallel: int = 1  # shard the D spatial axis ('spatial' mesh axis)
    tensor_parallel: int = 1  # shard conv output channels ('model' mesh axis)
    donate_state: bool = True
    # Overlap checkpoint writes with the next epoch's training (single-
    # process only). The device-to-host fetch + Orbax write runs in a
    # background thread; requires keeping the saved state's buffers alive,
    # so donation is disabled while on. HBM cost: the backpressure bound
    # (2 outstanding snapshots) permits up to TWO extra optimizer-state
    # copies alongside the live state in the worst case (latest(e) being
    # written + latest(e+1) queued). Worth it when saves are slow
    # relative to epochs — measured
    # on the tunneled chip the per-epoch saves cost 3-9x the compute
    # (BENCH.md "Checkpoint cost"); on local-PCIe hosts the win is ~1-2 s
    # per epoch. Writes collapse latest-wins with bounded backpressure, so
    # on storage slower than the epoch rate the durable 'latest' may lag
    # the live state by up to ~2 epochs (resume then replays them). Off by
    # default for the memory envelope.
    async_checkpoint: bool = False

    # ---- inference ----------------------------------------------------------
    threshold: float = 0.5
    # also report boundary metrics (robust Hausdorff / ASSD / normalized
    # surface Dice — ops/surface.py) per case in validation. Computed
    # host-side from the fetched uint8 masks, overlapped with the device's
    # next batch. Units: voxels of the evaluation grid in `validate`
    # (resampled to target_size), millimetres in `validate --native`.
    surface_metrics: bool = False
    hausdorff_percentile: float = 95.0
    surface_dice_tolerance: float = 1.0
    fold_bn: bool = True  # fold frozen BN into conv weights for serving
    # serving ingest on device: upload each modality RAW (native int16 is
    # the same 2 B/voxel H2D as the bf16 wire) and run percentile
    # normalize + cast + stack on the chip instead of the host C++ pass —
    # moves ~1.2 s/case of host work (BENCH.md configs[4] attribution)
    # onto the device. Host zlib decode + grid resampling remain host-side.
    device_ingest: bool = False
    # Fused Pallas convs for folded serving (TPU only). Off by default: the
    # kernels beat XLA's conv 1.8-2x standalone at the mid/deep levels, but
    # inside the full model XLA's cross-op fusion wins (measured 61 vs
    # 103 ms/vol at 128^3) — see ops/pallas/conv3d.py.
    pallas_inference: bool = False
    # test-time augmentation: 8-way axis-flip mirror ensemble at predict
    # time (8× inference compute for better Dice) — infer/tta.py
    tta: bool = False
    # connected-component filtering of thresholded masks
    # (infer/postprocess.py, nnU-Net-style; beyond-reference): 'largest_cc'
    # keeps only the largest foreground component; min_component_voxels
    # drops speckle below that count. Applies to predict/serve outputs and,
    # when set on validate, to the scored masks (so its Dice effect is
    # measurable).
    postprocess: str = "none"  # 'none' | 'largest_cc'
    min_component_voxels: int = 0
    sliding_window: bool = False  # full-volume overlap-tiled inference
    window_size: Tuple[int, int, int] = (128, 128, 128)
    window_overlap: float = 0.5
    window_blend: str = "gaussian"  # 'gaussian' (seam-free) | 'uniform'
    # tiles per device batch in sliding-window inference: batching feeds the
    # MXU bigger matmuls and shrinks the compiled program (one network
    # instance per GROUP of tiles, not per tile). Measured at 160³/128³w:
    # 0.503 (1) / 0.486 (2) / 0.479 (4) / 0.495 (8) s/vol — BENCH.md.
    window_tile_batch: int = 4

    def __post_init__(self):
        self.modalities = tuple(self.modalities)
        self.target_size = tuple(self.target_size)
        self.window_size = tuple(self.window_size)
        for name in ("target_size", "window_size"):
            dims = getattr(self, name)
            if any(s < MIN_INPUT_SIZE for s in dims):
                raise ValueError(
                    f"{name}={dims}: every dim must be >= {MIN_INPUT_SIZE} — "
                    f"the 4-level U-Net halves each spatial dim four times, "
                    f"and below {MIN_INPUT_SIZE} the bottleneck becomes an "
                    f"empty tensor (BatchNorm over zero elements -> NaN "
                    f"gradients)"
                )
        if self.train_crop is not None:
            self.train_crop = tuple(self.train_crop)
            if len(self.train_crop) != 3:
                raise ValueError(
                    f"train_crop must be (D,H,W), got {self.train_crop}"
                )
            if any(
                not MIN_INPUT_SIZE <= c <= t
                for c, t in zip(self.train_crop, self.target_size)
            ):
                raise ValueError(
                    f"train_crop {self.train_crop} must be within "
                    f"target_size {self.target_size} and every dim at "
                    f"least {MIN_INPUT_SIZE} (the model's minimum input: "
                    f"four 2x poolings)"
                )
            if self.train_crop == self.target_size:
                self.train_crop = None  # full-size crop is a no-op
        if not 0.0 <= self.oversample_fg <= 1.0:
            raise ValueError(
                f"oversample_fg={self.oversample_fg} must be in [0, 1] "
                f"(probability that a train_crop contains foreground)"
            )
        if self.oversample_mode not in ("center", "window"):
            raise ValueError(
                f"oversample_mode={self.oversample_mode!r}; expected "
                f"'center' (nnU-Net) or 'window' (round-4 variant)"
            )
        self.betas = tuple(self.betas)
        self.norm_percentiles = tuple(self.norm_percentiles)
        if self.missing_strategy not in MISSING_STRATEGIES:
            raise ValueError(
                f"missing_strategy={self.missing_strategy!r}; "
                f"expected one of {MISSING_STRATEGIES}"
            )
        if self.normalize not in NORMALIZE_MODES:
            raise ValueError(
                f"normalize={self.normalize!r}; expected one of {NORMALIZE_MODES}"
            )
        if self.loss not in LOSSES:
            raise ValueError(f"loss={self.loss!r}; expected one of {LOSSES}")
        if self.norm_layer not in NORM_LAYERS:
            raise ValueError(
                f"norm_layer={self.norm_layer!r}; expected one of {NORM_LAYERS}"
            )
        if self.conv_lowering not in (
            "auto", "lax", "im2col", "hybrid", "hybrid_pallas"
        ):
            raise ValueError(
                f"conv_lowering={self.conv_lowering!r}; expected 'auto', "
                "'lax', 'im2col', 'hybrid', or 'hybrid_pallas'"
            )
        if self.scheduler not in (
            "reduce_on_plateau", "cosine", "poly", "constant"
        ):
            raise ValueError(
                f"scheduler={self.scheduler!r}; expected 'reduce_on_plateau',"
                " 'cosine', 'poly', or 'constant'"
            )
        if self.data_type not in ("BPH", "PCA"):
            raise ValueError(f"data_type={self.data_type!r}; expected 'BPH' or 'PCA'")
        if len(self.target_size) != 3:
            raise ValueError(f"target_size must be (D,H,W), got {self.target_size}")
        if self.window_blend not in ("gaussian", "uniform"):
            raise ValueError(
                f"window_blend={self.window_blend!r}; "
                "expected 'gaussian' or 'uniform'"
            )
        if self.postprocess not in ("none", "largest_cc"):
            raise ValueError(
                f"postprocess={self.postprocess!r}; "
                "expected 'none' or 'largest_cc'"
            )
        if not 0.0 <= self.ema_decay < 1.0:
            raise ValueError(
                f"ema_decay={self.ema_decay}; expected 0 (off) or [0,1)"
            )
        if self.n_modalities != len(self.modalities):
            # keep them coherent — modalities list wins
            self.n_modalities = len(self.modalities)

    # -- dict round-trips (the reference API was plain dicts) ----------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**d)

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))


# Preset overlays — same names and intent as the reference
# (test/config_example.py:149-155), expressed as deltas over Config defaults.
PRESETS: Dict[str, Dict[str, Any]] = {
    # standard == BASE_CONFIG: 100 epochs, batch 1, lr 1e-4, patience 15
    "standard": {},
    # quick: fewer epochs, bigger batch, no validation / early stop
    "quick": {
        "num_epochs": 10,
        "batch_size": 2,
        "validation": False,
        "early_stopping": False,
    },
    # cross_validation: standard + 5 folds
    "cross_validation": {
        "n_splits": 5,
    },
    # high_performance: longer, bigger batch, lower LR, more patience.
    # batch 4 runs as 4 accumulated microbatches: monolithic batch 4 at
    # 128³ needs ~25 GB of conv-gradient buffers (BENCH.md memory
    # envelope) while accumulation is both in-budget AND the fastest
    # measured configuration (3.55 vol/s/chip); micro-batch-1 needs no
    # remat (re-enable `remat` when overriding to larger target sizes).
    "high_performance": {
        "num_epochs": 200,
        "batch_size": 4,
        "accum_steps": 4,
        "remat": False,
        "learning_rate": 5e-5,
        "patience": 20,
        "save_frequency": 5,
    },
    # small_dataset: CV with more folds, batch 1, augmentation on
    "small_dataset": {
        "n_splits": 10,
        "batch_size": 1,
        "learning_rate": 1e-4,
        "data_augmentation": True,
    },
}


def get_config(preset: str = "standard", **overrides) -> Config:
    """Build a :class:`Config` from a preset name plus keyword overrides.

    Mirrors the reference's ``get_config(preset, **kwargs)``
    (test/config_example.py:158-190) including the error on unknown presets.
    """
    if preset not in PRESETS:
        raise ValueError(
            f"unknown preset: {preset!r}. available: {sorted(PRESETS.keys())}"
        )
    merged = dict(PRESETS[preset])
    merged.update(overrides)
    return Config(**merged)
