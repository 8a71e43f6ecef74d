"""Single-split trainer: the capabilities of the reference's BaseTrainer /
BPHTrainer (utils/trainer.py:23-345, train_bph.py:24-348) on the TPU stack.

One epoch loop with:
  * jitted train/eval steps (donated state, bf16 compute, DP/spatial mesh)
  * host-side ReduceLROnPlateau (patience 10, factor 0.5) driving the
    injected optimizer LR
  * early stopping on the monitored loss (val loss when validation is on,
    train loss otherwise — unifying the reference's split behavior,
    SURVEY.md §8.8)
  * grad-clip 1.0 through the optax chain (train_bph.py:166 parity)
  * checkpoints: ``latest`` every epoch, ``best`` on improvement, periodic
    ``epoch_{e}`` every ``save_frequency`` epochs — plus REAL resume from
    ``latest`` (the reference claimed resume but never implemented it,
    SURVEY.md §8.9)
  * train-history dict {'train_loss': [...], 'val_loss': [...]} like
    train_bph.py:122-125 / train_bph_cv.py:227.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from pcmseg_tpu.core.config import Config
from pcmseg_tpu.data.dataset import ProstateDataset
from pcmseg_tpu.data.loader import DataLoader, RamCaseCache
from pcmseg_tpu.models import UNet3D
from pcmseg_tpu.parallel.sharding import (
    batch_sharding,
    make_mesh,
    shard_state,
)
from pcmseg_tpu.train.checkpoints import (
    checkpoint_exists,
    copy_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from pcmseg_tpu.train.schedule import EarlyStopping, make_scheduler
from pcmseg_tpu.train.steps import (
    create_train_state,
    jit_eval_step,
    jit_train_step,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)
from pcmseg_tpu.utils.logging import StepTimer, get_logger


class Trainer:
    """Config-driven trainer over one train(/val) split."""

    def __init__(
        self,
        config: Config,
        dataset: Optional[ProstateDataset] = None,
        train_indices: Optional[Sequence[int]] = None,
        val_indices: Optional[Sequence[int]] = None,
        tag: str = "",
    ):
        self.config = config
        self.tag = tag
        self.log = get_logger(f"pcmseg.trainer{('.' + tag) if tag else ''}")

        self.dataset = dataset or ProstateDataset(
            data_dir=config.data_dir,
            data_type=config.data_type,
            modalities=config.modalities,
            missing_strategy=config.missing_strategy,
            target_size=config.target_size,
            normalize=config.normalize,
            norm_percentiles=config.norm_percentiles,
            cache_dir=config.cache_dir,
            n_classes=config.n_classes,
            coregister=config.coregister,
        )
        if len(self.dataset) == 0:
            raise RuntimeError(
                f"no valid cases found under {config.data_dir!r} "
                f"(data_type={config.data_type})"
            )

        # -- split ----------------------------------------------------------
        n = len(self.dataset)
        if train_indices is None and val_indices is not None:
            # val alone: train on the complement (previously this branch
            # silently overwrote the caller's val_indices with a new split)
            val_set = {int(i) for i in val_indices}
            train_indices = [i for i in range(n) if i not in val_set]
        elif train_indices is None:
            if config.validation and n >= 2:
                rng = np.random.default_rng(config.seed)
                perm = rng.permutation(n)
                n_val = max(1, int(round(n * config.val_fraction)))
                val_indices = np.sort(perm[:n_val]).tolist()
                train_indices = np.sort(perm[n_val:]).tolist()
            else:
                train_indices = list(range(n))
                val_indices = None
        self.train_indices = list(train_indices)
        self.val_indices = list(val_indices) if val_indices is not None else None

        # -- mesh (needed before the loaders: batches pad to a DP multiple) --
        try:
            self.mesh = make_mesh(
                config.data_parallel,
                config.spatial_parallel,
                config.tensor_parallel,
            )
        except ValueError:
            self.log.warning("mesh config infeasible on this host; using 1x1x1")
            self.mesh = make_mesh(1, 1, 1)
        dp = self.mesh.shape["data"]
        # multi-host: this process loads only its slice of each global batch
        self.process_count = jax.process_count()
        self.process_index = jax.process_index()
        self.is_primary = self.process_index == 0
        # every batch (ragged tail included) pads up to the same size,
        # divisible by both the DP degree and the process count: one
        # compiled shape per epoch, always sharded, padding masked out of
        # the loss via the batch's weight vector (VERDICT.md weak #5)
        import math

        # padded batches must split across DP shards AND processes AND the
        # gradient-accumulation microbatching (a pad_to divisible by dp but
        # not accum_steps would trace-fail in make_train_step)
        q = dp * self.process_count // math.gcd(dp, self.process_count)
        accum = max(1, int(getattr(config, "accum_steps", 1)))
        q = q * accum // math.gcd(q, accum)
        pad_to = -(-config.batch_size // q) * q
        self._pad_to = pad_to
        process_shard = (
            (self.process_index, self.process_count)
            if self.process_count > 1
            else None
        )

        augmenter = None
        if config.data_augmentation or config.train_crop:
            from pcmseg_tpu.data.augment import Augmenter

            # train_crop alone installs a crop-only augmenter (the
            # spatial/intensity augs stay gated on data_augmentation)
            aug_on = config.data_augmentation
            augmenter = Augmenter(
                seed=config.seed,
                flip=aug_on and config.aug_flip,
                rot90=aug_on and config.aug_rot90,
                intensity_jitter=(
                    config.aug_intensity_jitter if aug_on else 0.0
                ),
                crop=config.train_crop,
                oversample_fg=config.oversample_fg,
                oversample_mode=getattr(config, "oversample_mode", "center"),
                scale=config.aug_scale if aug_on else 0.0,
                rotate_deg=config.aug_rotate_deg if aug_on else 0.0,
                gamma=config.aug_gamma if aug_on else 0.0,
                noise=config.aug_noise if aug_on else 0.0,
                blur_prob=config.aug_blur_prob if aug_on else 0.0,
            )
        self.train_loader = DataLoader(
            self.dataset,
            batch_size=config.batch_size,
            shuffle=True,
            indices=self.train_indices,
            seed=config.seed,
            augmenter=augmenter,
            pad_to=pad_to,
            process_shard=process_shard,
        )
        self.val_loader = (
            DataLoader(
                self.dataset,
                batch_size=config.batch_size,
                shuffle=False,
                indices=self.val_indices,
                pad_to=pad_to,
                process_shard=process_shard,
            )
            if self.val_indices
            else None
        )

        # -- model / state ----------------------------------------------------
        self.model = UNet3D.from_config(config)
        d, h, w = config.target_size
        init_shape = (1, d, h, w, config.n_modalities)
        self.state = create_train_state(
            config, jax.random.key(config.seed), self.model, init_shape
        )
        self.state = shard_state(self.state, self.mesh)

        # async checkpointing needs the saved state's buffers to outlive
        # the next optimizer update → no donation while it's on.
        # Multi-host async is safe because every cross-process sync in the
        # save path (ours and Orbax's) is a coordination-SERVICE barrier,
        # not a device collective — worker threads never enqueue device
        # ops that could interleave against the main thread's training
        # collectives (checkpoints.py _process_barrier). Each process runs
        # its own worker; saves stay in lockstep because submission order
        # is epoch order on every process.
        self._async_ckpt = bool(getattr(config, "async_checkpoint", False))
        self._ckpt_pool = None
        self._ckpt_futures: List = []
        donate = config.donate_state and not self._async_ckpt

        self._train_step = jit_train_step(
            make_train_step(self.model, config), donate=donate
        )
        self._eval_step = jit_eval_step(make_eval_step(self.model, config))

        # -- device-resident dataset cache ------------------------------------
        # the streaming loader is H2D-transfer-bound (BENCH.md "End-to-end
        # training throughput"); when the whole preprocessed dataset fits
        # the HBM budget, upload it once and gather batches on device.
        # Multi-host: each process decodes only its shard's cases
        # (device_cache._build_multiprocess); batch gathers use identical
        # seed-derived index vectors on every process, with GSPMD moving
        # cross-shard rows over ICI/DCN
        self._dcache = None
        self._dcache_partial = False
        self._stream_train_loader = None
        self._stream_val_loader = None
        mesh_size = int(np.prod(tuple(self.mesh.shape.values())))
        if getattr(config, "device_data_cache_gb", 0) > 0:
            from pcmseg_tpu.data.device_cache import (
                build_device_cache,
                dataset_device_bytes,
                make_cached_eval_step,
                make_cached_train_step,
            )

            # the stacks shard over ('data','spatial'): per-device cost is
            # total/(dp*sp), so the budget is per-DEVICE HBM
            shards = self.mesh.shape["data"] * self.mesh.shape["spatial"]
            n_cases = len(self.dataset)
            per_case = dataset_device_bytes(
                1, config.target_size, config.n_modalities
            )
            budget = config.device_data_cache_gb * 1e9 * shards
            n_fit = int(budget // per_case)
            resident = None
            if n_fit >= n_cases:
                resident = list(range(n_cases))
            elif n_fit >= self._pad_to and getattr(
                config, "device_cache_partial", True
            ):
                # partial cache (VERDICT r4 missing #2): keep the subset
                # that fits resident — train cases first (gathered every
                # epoch), then val — and stream the remainder, interleaved
                # into the cached dispatch order so its H2D overlaps
                # cached-step compute (_train_epoch_cached)
                resident = list(self.train_indices)[:n_fit]
                if len(resident) < n_fit and self.val_indices:
                    resident += list(self.val_indices)[: n_fit - len(resident)]
                self._dcache_partial = True
            if resident is not None:
                self.log.info(
                    "device data cache: %d/%d cases resident in HBM "
                    "(%.2f GB/device over %d shard(s))%s",
                    len(resident), n_cases,
                    len(resident) * per_case / shards / 1e9, shards,
                    " — remainder streams (partial cache)"
                    if self._dcache_partial else "",
                )
                cache_mesh = self.mesh if mesh_size > 1 else None
                self._dcache = build_device_cache(
                    self.dataset, num_workers=4, mesh=cache_mesh,
                    indices=resident if self._dcache_partial else None,
                )
                self._cached_train_step = jax.jit(
                    make_cached_train_step(
                        self.model,
                        config,
                        make_train_step(self.model, config),
                        mesh=cache_mesh,
                    ),
                    donate_argnums=(0,) if donate else (),
                )
                self._cached_eval_step = jax.jit(
                    make_cached_eval_step(
                        self.model,
                        config,
                        make_eval_step(self.model, config),
                        mesh=cache_mesh,
                    )
                )
            if self._dcache_partial:
                # case index -> resident stack row, and the split of the
                # train/val sets into cached vs streamed portions
                self._dcache_row = {c: r for r, c in enumerate(resident)}
                res = set(resident)
                self._res_train = [i for i in self.train_indices if i in res]
                self._str_train = [
                    i for i in self.train_indices if i not in res
                ]
                self._res_val = [
                    i for i in (self.val_indices or []) if i in res
                ]
                self._str_val = [
                    i for i in (self.val_indices or []) if i not in res
                ]
                # memoize the remainder's wire-format arrays in host RAM
                # (bounded by stream_host_cache_gb): the per-epoch .npz
                # re-decode otherwise competes with the dispatch thread
                # for CPU and erodes the interleave overlap (BENCH.md
                # round-5 partial-cache A/B)
                ram_gb = getattr(config, "stream_host_cache_gb", 4.0)
                n_ram = int(ram_gb * 1e9 // per_case) if ram_gb > 0 else 0
                streamed = self._str_train + self._str_val
                stream_ds = (
                    RamCaseCache(self.dataset, streamed[:n_ram])
                    if n_ram > 0 else self.dataset
                )
                self._stream_train_loader = DataLoader(
                    stream_ds,
                    batch_size=config.batch_size,
                    shuffle=True,
                    indices=self._str_train,
                    seed=config.seed,
                    augmenter=augmenter,
                    pad_to=pad_to,
                    process_shard=process_shard,
                ) if self._str_train else None
                self._stream_val_loader = DataLoader(
                    stream_ds,
                    batch_size=config.batch_size,
                    shuffle=False,
                    indices=self._str_val,
                    pad_to=pad_to,
                    process_shard=process_shard,
                ) if self._str_val else None
        self._epochs_run = 0

        self.scheduler = make_scheduler(config)
        self.early_stopping = EarlyStopping(patience=config.patience)
        self.history: Dict[str, List[float]] = {"train_loss": [], "val_loss": []}
        self.best_monitor = float("inf")
        self.start_epoch = 0
        self.timer = StepTimer(warmup_steps=1)
        from pcmseg_tpu.utils.profiling import StepTraceController

        self.tracer = StepTraceController(
            config.profile_dir, n_steps=config.profile_steps
        )

        if config.resume:
            self._try_resume()

    # -- checkpoint plumbing ---------------------------------------------------

    def _save_epoch(
        self,
        epoch: int,
        monitor: float,
        is_best: bool,
        periodic: Optional[str] = None,
    ) -> None:
        """Write this epoch's checkpoints — synchronously, or
        (async_checkpoint) in a background thread overlapping the next
        epoch.

        ONE device fetch per epoch: the state is serialized once into
        'latest'; 'best' and periodic 'epoch_{N}' checkpoints — the SAME
        state — are host-side payload copies (copy_checkpoint), not second
        saves. On a tunneled/remote chip the D2H fetch dominates save cost
        and contends with the training stream on the same link (measured,
        BENCH.md round-3 "Checkpoint cost": full save ~23 s vs disk copy
        ~1 s for the flagship state), so the naive save-twice-on-improve
        doubled the checkpoint stall of most early epochs.

        Async safety & bounds:
          * donation is off in async mode, so a submitted state's buffers
            stay valid while the writer fetches them;
          * the meta dict is deep-copied at submit time (the live history
            keeps growing under the writer);
          * LATEST-WINS COLLAPSING: a queued-but-not-started task is
            cancelled when a newer one of the same strength arrives
            ('latest' collapses onto newer 'latest', 'best'+latest onto
            newer 'best'+latest — the newer best is strictly better; a
            plain 'latest' never cancels a queued 'best', and periodic
            tasks are never collapsed);
          * BACKPRESSURE: at most 2 snapshots outstanding — without this,
            epochs faster than the storage link accumulate one full
            optimizer state per epoch until HBM exhausts (measured: the
            flagship run OOM'd at ~epoch 8 on the tunneled chip).
        Failures surface at the next epoch boundary / end of training.
        """
        meta = self._meta(epoch, monitor)
        latest = self._ckpt_name("latest")
        copies = []
        if is_best:
            copies.append(self._ckpt_name("best"))
        if periodic:
            copies.append(self._ckpt_name(periodic))

        def work(state, meta_snapshot):
            save_checkpoint(self.config.save_dir, latest, state, meta_snapshot)
            for dst in copies:
                copy_checkpoint(self.config.save_dir, latest, dst)

        if not self._async_ckpt:
            work(self.state, meta)
            return
        import copy
        from concurrent.futures import ThreadPoolExecutor

        if self._ckpt_pool is None:
            self._ckpt_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="pcmseg_ckpt"
            )
        # task name = strongest component it writes (collapsing key).
        # Collapsing is single-process only: whether a queued save can be
        # cancelled depends on local worker timing, so across processes it
        # would desynchronize the lockstep save sequence that Orbax's
        # barriers and the payload-name counter both rely on.
        name = "periodic" if periodic else ("best" if is_best else "latest")
        if name != "periodic" and self.process_count == 1:
            kept = []
            for n, f in self._ckpt_futures:
                if n == name and f.cancel():
                    continue
                kept.append((n, f))
            self._ckpt_futures = kept
        # backpressure: wait until <2 un-finished snapshots remain
        while True:
            live = [
                (n, f) for n, f in self._ckpt_futures
                if not f.done() and not f.cancelled()
            ]
            if len(live) < 2:
                break
            live[0][1].result()  # oldest; re-raises writer failures
        self._prune_done()
        self._ckpt_futures.append(
            (name, self._ckpt_pool.submit(work, self.state, copy.deepcopy(meta)))
        )

    def _prune_done(self) -> None:
        still = []
        for n, f in self._ckpt_futures:
            if f.cancelled():
                continue
            if f.done():
                f.result()  # re-raise any writer exception
            else:
                still.append((n, f))
        self._ckpt_futures = still

    def _drain_saves(self, wait: bool = False) -> None:
        """Surface async save failures; optionally block until all done."""
        if wait:
            for n, f in self._ckpt_futures:
                if not f.cancelled():
                    f.result()
            self._ckpt_futures.clear()
            return
        self._prune_done()

    def _ckpt_name(self, base: str) -> str:
        return f"{base}_{self.tag}" if self.tag else base

    def _meta(self, epoch: int, monitor: float) -> dict:
        return {
            "epoch": epoch,
            "monitor": monitor,
            "best_monitor": self.best_monitor,
            "history": self.history,
            "scheduler": self.scheduler.state_dict(),
            "early_stopping": self.early_stopping.state_dict(),
            "config": self.config.to_dict(),
            "tag": self.tag,
        }

    def _try_resume(self) -> None:
        name = self._ckpt_name("latest")
        if not checkpoint_exists(self.config.save_dir, name):
            self.log.info("resume requested but no latest checkpoint; fresh start")
            return
        path = os.path.join(self.config.save_dir, name)
        self.state, meta = load_checkpoint(path, self.state)
        self.state = shard_state(self.state, self.mesh)
        self.history = meta.get("history", self.history)
        self.best_monitor = meta.get("best_monitor", float("inf"))
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self._epochs_run = self.start_epoch  # fresh shuffles after resume
        # the streaming loaders' shuffle/augmentation streams are
        # (seed, epoch)-derived from an internal counter — align it so
        # the resumed run replays the same per-epoch order an
        # uninterrupted run would have (the cached path gets this from
        # _epochs_run already)
        self.train_loader.set_epoch(self.start_epoch)
        if self.val_loader is not None:
            self.val_loader.set_epoch(self.start_epoch)
        if self._stream_train_loader is not None:
            self._stream_train_loader.set_epoch(self.start_epoch)
        if self._stream_val_loader is not None:
            self._stream_val_loader.set_epoch(self.start_epoch)
        if "scheduler" in meta:
            self.scheduler.load_state_dict(meta["scheduler"])
        if "early_stopping" in meta:
            self.early_stopping.load_state_dict(meta["early_stopping"])
        self.log.info("resumed from %s at epoch %d", path, self.start_epoch)

    # -- epoch loops -----------------------------------------------------------

    def _device_batches(self, loader: DataLoader):
        # loaders pad every batch to a DP-divisible size, so batches are
        # always sharded — no replicated-tail special case, no retrace
        multiproc = self.process_count > 1

        def host_batches():
            for batch in loader:
                # real (unpadded) sample count, recorded host-side:
                # globally sharded arrays aren't addressable from one
                # process
                batch["n_real"] = float(np.sum(batch["weight"]))
                yield batch

        if multiproc:
            # global batches must be built in lockstep across processes —
            # no concurrent transfers here
            from pcmseg_tpu.parallel.multihost import make_global_batch

            for batch in host_batches():
                n_real = batch.pop("n_real")
                out = make_global_batch(batch, self.mesh)
                out["n_real"] = n_real
                yield out
            return

        # concurrent H2D: over a tunneled backend one device_put streams at
        # the link's single-request rate; two in flight pipeline the link
        # (measured: BENCH.md "End-to-end training throughput")
        from pcmseg_tpu.data.loader import prefetch_to_device_concurrent

        yield from prefetch_to_device_concurrent(
            host_batches(),
            sharding=lambda v: batch_sharding(self.mesh, v.ndim),
            workers=2,
            depth=max(2, self.config.prefetch + 1),
        )

    def _index_batches(self, indices, shuffle: bool, epoch: int):
        """Padded (idx, weights) batches over the device-resident cache."""
        from pcmseg_tpu.data.loader import _padded_plan

        order = list(indices)
        if shuffle:
            rng = np.random.default_rng(self.config.seed + epoch)
            rng.shuffle(order)
        bs = self.config.batch_size
        for i in range(0, len(order), bs):
            picked, weights = _padded_plan(order[i : i + bs], self._pad_to)
            yield (
                np.asarray(picked, np.int32),
                np.asarray(weights, np.float32),
            )

    def _consume_loss(
        self, step_idx: int, metrics, losses: list, n_total: int = 0
    ) -> float:
        """Fetch a (possibly one-step-old) loss, guard non-finite, log.

        Training steps are dispatched asynchronously; fetching step n-1's
        loss AFTER enqueueing step n keeps the device busy through the
        host's D2H round-trip (on the tunnel that latency was the whole
        3.42-vs-3.55 vol/s gap). The non-finite abort therefore fires one
        step late — one extra step runs on the poisoned state, but the
        raise still prevents the epoch from completing or checkpointing it.
        """
        loss = float(metrics["loss"])
        if not np.isfinite(loss):
            raise FloatingPointError(
                f"non-finite training loss ({loss}) at batch {step_idx} "
                f"— aborting instead of training on"
            )
        losses.append(loss)
        # per-batch logging cadence (reference BASE_CONFIG's
        # log_frequency/print_frequency, config_example.py:48-50)
        if self.config.log_frequency and (
            step_idx % max(self.config.log_frequency, 1) == 0
        ):
            self.log.debug("batch %d: loss %.4f", step_idx, loss)
        if self.config.print_frequency and (
            (step_idx + 1) % max(self.config.print_frequency, 1) == 0
        ):
            self.log.info(
                "batch %d/%s: loss %.4f (%.2f vol/s)",
                step_idx + 1, n_total or "?", loss,
                self.timer.items_per_sec,
            )
        return loss

    def _train_epoch_cached(self) -> float:
        from pcmseg_tpu.data.loader import background_prefetch

        cache = self._dcache
        epoch = self._epochs_run
        key = jax.random.key(self.config.seed * 9973 + epoch)
        losses = []
        bs = self.config.batch_size
        cached_indices = (
            self._res_train if self._dcache_partial else self.train_indices
        )
        n_c = -(-len(cached_indices) // bs)  # ceil: padded batches
        n_s = 0
        stream_iter = None
        if self._dcache_partial and self._stream_train_loader is not None:
            n_s = len(self._stream_train_loader)
            # start the remainder's decode+H2D pipeline up front; its
            # batches are interleaved into the dispatch order below so
            # the transfers overlap the cached steps' compute instead of
            # serializing after them
            stream_iter = iter(
                background_prefetch(
                    self._device_batches(self._stream_train_loader),
                    depth=self.config.prefetch,
                )
            )
        n_total = n_c + n_s
        cached_iter = self._index_batches(cached_indices, True, epoch)
        pending = None  # (step_idx, metrics) of the in-flight step
        err = 0  # Bresenham spread of the n_s streamed batches over n_total
        for step_idx in range(n_total):
            err += n_s
            take_stream = err >= n_total
            if take_stream:
                err -= n_total
                batch = next(stream_iter)
                n = int(batch["n_real"])
                self.tracer.on_step(step_idx)
                self.timer.start()
                self.state, metrics = self._train_step(
                    self.state,
                    {
                        "image": batch["image"],
                        "label": batch["label"],
                        "weight": batch["weight"],
                    },
                )
            else:
                idx, weights = next(cached_iter)
                if self._dcache_partial:
                    idx = np.asarray(
                        [self._dcache_row[int(i)] for i in idx], np.int32
                    )
                key, sub = jax.random.split(key)
                n = int(weights.sum())
                self.tracer.on_step(step_idx)
                self.timer.start()
                self.state, metrics = self._cached_train_step(
                    self.state, cache["images"], cache["labels"],
                    idx, weights, sub,
                )
            if pending is not None:
                self._consume_loss(*pending, losses, n_total)
            pending = (step_idx, metrics)
            self.timer.stop(items=n)
        if pending is not None:
            self._consume_loss(*pending, losses, n_total)
        self.tracer.close()
        return float(np.mean(losses)) if losses else float("nan")

    def train_epoch(self) -> float:
        from pcmseg_tpu.data.loader import background_prefetch

        if self._dcache is not None:
            try:
                return self._train_epoch_cached()
            finally:
                self._epochs_run += 1
        losses = []
        try:
            n_total = len(self.train_loader)
        except TypeError:
            n_total = 0
        pending = None  # (step_idx, metrics) of the in-flight step
        for step_idx, batch in enumerate(
            background_prefetch(
                self._device_batches(self.train_loader),
                depth=self.config.prefetch,
            )
        ):
            n = int(batch["n_real"])  # real (unpadded) samples, this process
            self.tracer.on_step(step_idx)
            self.timer.start()
            self.state, metrics = self._train_step(
                self.state,
                {
                    "image": batch["image"],
                    "label": batch["label"],
                    "weight": batch["weight"],
                },
            )
            if pending is not None:
                self._consume_loss(*pending, losses, n_total)
            pending = (step_idx, metrics)
            self.timer.stop(items=n)
        if pending is not None:
            self._consume_loss(*pending, losses, n_total)
        self.tracer.close()  # flush if the epoch was shorter than the window
        return float(np.mean(losses)) if losses else float("nan")

    def validate_epoch(self) -> Dict[str, float]:
        # All eval steps are enqueued back-to-back; the device metrics
        # (4 scalars per batch — weighted scalar sums of replicated
        # outputs rather than per-sample fetches, since globally-sharded
        # per-sample arrays aren't addressable from a single process in
        # multi-host mode) are fetched in ONE device_get at the end, so
        # the device never idles on a per-batch D2H round-trip.
        device_metrics = []
        if self._dcache is not None:
            cache = self._dcache
            cached_val = (
                self._res_val if self._dcache_partial else self.val_indices
            )
            for idx, weights in self._index_batches(cached_val, False, 0):
                if self._dcache_partial:
                    idx = np.asarray(
                        [self._dcache_row[int(i)] for i in idx], np.int32
                    )
                device_metrics.append(
                    self._cached_eval_step(
                        self.state, cache["images"], cache["labels"],
                        idx, weights,
                    )
                )
            if self._dcache_partial and self._stream_val_loader is not None:
                for batch in self._device_batches(self._stream_val_loader):
                    device_metrics.append(
                        self._eval_step(
                            self.state,
                            {
                                "image": batch["image"],
                                "label": batch["label"],
                                "weight": batch["weight"],
                            },
                        )
                    )
                    i = len(device_metrics) - 1 - 3
                    if i >= 0:
                        device_metrics[i] = jax.device_get(device_metrics[i])
        else:
            # Streaming batches hold their H2D input buffers until the
            # eval step that consumes them executes, so bound the number
            # of dispatched-but-unexecuted steps: fetch metrics a few
            # batches behind dispatch (pipelined, like the train-loss
            # fetch — the device never idles at depth 3, but in-flight
            # input HBM stays ~3 batches instead of the whole val set).
            depth = 3
            for batch in self._device_batches(self.val_loader):
                device_metrics.append(
                    self._eval_step(
                        self.state,
                        {
                            "image": batch["image"],
                            "label": batch["label"],
                            "weight": batch["weight"],
                        },
                    )
                )
                i = len(device_metrics) - 1 - depth
                if i >= 0:
                    device_metrics[i] = jax.device_get(device_metrics[i])
        fetched = jax.device_get(device_metrics)
        losses = [float(m["loss"]) for m in fetched]
        dice_sum = sum(float(m["dice_sum"]) for m in fetched)
        iou_sum = sum(float(m["iou_sum"]) for m in fetched)
        w_sum = sum(float(m["weight_sum"]) for m in fetched)
        return {
            "loss": float(np.mean(losses)) if losses else float("nan"),
            "dice": dice_sum / max(w_sum, 1.0),
            "iou": iou_sum / max(w_sum, 1.0),
        }

    def train(self) -> Dict[str, List[float]]:
        try:
            return self._train_impl()
        finally:
            # release the async-ckpt worker on EVERY exit path: without
            # this, an exception (e.g. the NaN abort) leaves a non-daemon
            # thread keeping the process alive, and sweep/CV runs leak
            # one idle worker per Trainer
            self.close()

    def _train_impl(self) -> Dict[str, List[float]]:
        cfg = self.config
        self.log.info(
            "training %d cases (val: %s) for %d epochs, batch %d, mesh %s",
            len(self.train_indices),
            len(self.val_indices) if self.val_indices else 0,
            cfg.num_epochs,
            cfg.batch_size,
            dict(self.mesh.shape),
        )
        # the schedule's current rate, not config.learning_rate: under
        # warmup (or a resume mid-decay) the first epoch's LR differs from
        # the value create_train_state injected
        self.state = set_learning_rate(self.state, self.scheduler.lr)
        for epoch in range(self.start_epoch, cfg.num_epochs):
            train_loss = self.train_epoch()
            self.history["train_loss"].append(train_loss)

            if self.val_loader is not None:
                val = self.validate_epoch()
                self.history["val_loss"].append(val["loss"])
                self.history.setdefault("val_dice", []).append(val["dice"])
                self.history.setdefault("val_iou", []).append(val["iou"])
                monitor = val["loss"]
                self.log.info(
                    "epoch %d: train %.4f val %.4f dice %.4f iou %.4f "
                    "lr %.2e (%.2f vol/s)",
                    epoch, train_loss, val["loss"], val["dice"], val["iou"],
                    self.scheduler.lr, self.timer.items_per_sec,
                )
            else:
                monitor = train_loss
                self.log.info(
                    "epoch %d: train %.4f lr %.2e (%.2f vol/s)",
                    epoch, train_loss, self.scheduler.lr, self.timer.items_per_sec,
                )

            # LR schedule (plateau/cosine/poly/warmup) → injected hyperparam
            new_lr = self.scheduler.step(monitor)
            self.state = set_learning_rate(self.state, new_lr)

            # checkpoints: latest always; best on monitored improvement.
            # best_monitor is updated BEFORE the latest save so that a
            # resume from latest(e) can never re-award 'best' to a later
            # epoch that is worse than e.
            self._drain_saves()  # surface any async writer failure early
            is_best = monitor < self.best_monitor
            if is_best:
                self.best_monitor = monitor
            periodic = (
                f"epoch_{epoch + 1}"
                if cfg.save_frequency and (epoch + 1) % cfg.save_frequency == 0
                else None
            )
            self._save_epoch(epoch, monitor, is_best, periodic)

            if cfg.early_stopping and self.early_stopping.step(monitor):
                self.log.info("early stopping at epoch %d", epoch)
                break
        self._drain_saves(wait=True)
        return self.history

    def close(self) -> None:
        """Release the async-checkpoint worker thread (idempotent).

        Completes (never cancels) queued writes — a queued 'latest'/'best'
        of a finite epoch keeps its durability value even when training
        aborted. ``train()`` calls this on every exit path; a Trainer can
        be reused afterwards (the pool is lazily recreated on next save).
        """
        pool, self._ckpt_pool = self._ckpt_pool, None
        if pool is not None:
            pool.shutdown(wait=True)
            for n, f in self._ckpt_futures:
                if not f.cancelled():
                    f.exception()  # consume; avoid never-retrieved warnings
            self._ckpt_futures.clear()
