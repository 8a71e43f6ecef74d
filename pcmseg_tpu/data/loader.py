"""Batch iteration with background loading and device prefetch.

The TPU-native replacement for the reference's
``torch.utils.data.DataLoader(pin_memory=True, num_workers=0)``
(script/data_loader.py:421-466): a thread pool overlaps host-side NIfTI
decode/resample with device compute, and ``prefetch_to_device`` keeps
``prefetch`` batches ahead in HBM (double buffering) so the TPU never waits
on the host. Supports Subset-style index restriction for cross-validation
exactly like the reference's ``indices`` kwarg (data_loader.py:452-455).
"""

from __future__ import annotations

import itertools
import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence

import numpy as np

from pcmseg_tpu.core.config import DEFAULT_MODALITIES
from pcmseg_tpu.data.dataset import ProstateDataset


def _padded_plan(
    idxs: List[int], pad_to: Optional[int]
) -> "Tuple[List[int], List[float]]":
    """(dataset indices, per-sample weights) for one batch, padding included.

    Padding cycles *real* samples (keeping BatchNorm statistics on-data)
    and marks them with weight 0 so the mask-aware loss/metrics ignore
    them — a ragged tail batch therefore keeps the same compiled shape and
    sharding as every full batch instead of retracing + replicating.
    """
    n = len(idxs)
    total = pad_to if pad_to is not None and pad_to > n else n
    picked = [idxs[i % n] for i in range(total)]
    return picked, [1.0] * n + [0.0] * (total - n)


def _collate(samples: List[dict], weights: Optional[List[float]] = None) -> dict:
    if weights is None:
        weights = [1.0] * len(samples)
    return {
        "image": np.stack([s["image"] for s in samples]),
        "label": np.stack([s["label"] for s in samples]),
        "case_id": [s["case_id"] for s in samples],
        "weight": np.asarray(weights, np.float32),
    }


class RamCaseCache:
    """Dataset view memoizing ``load_case`` results in host RAM for a
    fixed index set (wire-format bf16/u8 arrays — ~23 MB per 128³
    5-modality case).

    Built for the PARTIAL device cache's streamed remainder: those cases
    are re-read every epoch, and on a loaded host the per-epoch .npz
    decompress + copy competes with the dispatch thread for CPU
    (measured: the partial path ran at 70% of the fully-cached rate
    before this memo, BENCH.md round-5). Augmentation stays fresh — the
    Augmenter runs after ``load_case`` and returns new arrays, never
    mutating the memoized sample. Everything else delegates to the base
    dataset."""

    def __init__(self, base, indices: Sequence[int]):
        self.base = base
        self._keep = {int(i) for i in indices}
        self._memo: dict = {}

    def load_case(self, i: int) -> dict:
        got = self._memo.get(i)
        if got is None:
            got = self.base.load_case(i)
            if i in self._keep:
                self._memo[i] = got
        return got

    def __len__(self) -> int:
        return len(self.base)

    def __getattr__(self, name):
        return getattr(self.base, name)


class DataLoader:
    """Iterates batches of a ProstateDataset (optionally index-restricted).

    Args:
      dataset: the ProstateDataset.
      batch_size: global batch size.
      shuffle: reshuffle case order every epoch (seeded, deterministic).
      indices: optional subset of dataset indices (CV folds).
      num_workers: host threads decoding cases concurrently.
      drop_last: drop the final partial batch. Default False to match the
        reference; note a partial batch triggers one extra XLA compile for
        its shape (traced once, cached after) unless ``pad_to`` is set.
      pad_to: pad every smaller batch up to this many samples by cycling
        real samples, marked weight-0 in the batch's 'weight' vector (the
        losses/metrics mask them out). One compiled shape for the whole
        epoch, DP-shardable tail included.
      process_shard: (process_index, process_count) — multi-host mode: this
        loader yields only this host's contiguous slice of every (padded)
        global batch; combine with
        :func:`pcmseg_tpu.parallel.multihost.make_global_batch`. The padded
        batch size must divide by process_count.
      seed: shuffle seed.
    """

    def __init__(
        self,
        dataset: ProstateDataset,
        batch_size: int = 2,
        shuffle: bool = True,
        indices: Optional[Sequence[int]] = None,
        num_workers: int = 4,
        drop_last: bool = False,
        pad_to: Optional[int] = None,
        process_shard: Optional[tuple] = None,
        seed: int = 0,
        augmenter=None,
    ):
        self.dataset = dataset
        self.augmenter = augmenter
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.indices = list(indices) if indices is not None else list(
            range(len(dataset))
        )
        for i in self.indices:
            if not 0 <= i < len(dataset):
                raise IndexError(
                    f"subset index {i} out of range for dataset of "
                    f"{len(dataset)} cases"
                )
        self.num_workers = max(1, int(num_workers))
        self.drop_last = drop_last
        self.pad_to = pad_to
        self.process_shard = tuple(process_shard) if process_shard else None
        self.seed = seed
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        """Align the loader's epoch counter (shuffle + augmentation seeds
        are (seed, epoch)-derived). The trainer calls this on resume so a
        restarted run replays the SAME per-epoch case order an
        uninterrupted run would have used — without it, a resume at epoch
        e reuses epoch 0's order and the continuation is no longer
        bit-identical (caught by
        tests/test_multihost.py::test_cluster_kill_one_process_then_resume)."""
        self._epoch = int(epoch)

    @property
    def case_ids(self) -> List[str]:
        return [self.dataset.case_list[i].case_id for i in self.indices]

    def __iter__(self) -> Iterator[dict]:
        order = list(self.indices)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1

        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        epoch = self._epoch - 1

        def load_one(i: int) -> dict:
            sample = self.dataset.load_case(i)
            if self.augmenter is not None:
                sample = self.augmenter(sample, epoch, i)
            return sample

        def plan(b: List[int]):
            """Padded (indices, weights) for this host's share of batch b."""
            picked, weights = _padded_plan(b, self.pad_to)
            if self.process_shard is not None:
                pi, pc = self.process_shard
                if len(picked) % pc:
                    raise ValueError(
                        f"padded batch size {len(picked)} not divisible by "
                        f"process_count={pc}; set pad_to to a multiple"
                    )
                local = len(picked) // pc
                picked = picked[pi * local : (pi + 1) * local]
                weights = weights[pi * local : (pi + 1) * local]
            return picked, weights

        def realize(b: List[int]) -> dict:
            picked, weights = plan(b)
            # padded tails cycle real indices — decode each distinct index
            # once and reuse the array, not one full decode per repeat
            memo: dict = {}
            samples = []
            for i in picked:
                if i not in memo:
                    memo[i] = load_one(i)
                samples.append(memo[i])
            return _collate(samples, weights)

        if self.num_workers <= 1:
            for b in batches:
                yield realize(b)
            return

        # overlap decode of the next few batches with consumption of the
        # current one — bounded window so at most `window` batches are
        # resident ahead of the consumer (submitting the whole epoch up
        # front would decode every volume into host memory at once)
        window = self.num_workers + 1
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = deque()
            it = iter(batches)
            for b in itertools.islice(it, window):
                pending.append(pool.submit(realize, b))
            while pending:
                f = pending.popleft()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(pool.submit(realize, nxt))
                yield f.result()


def get_dataloader(
    data_dir: str,
    batch_size: int = 2,
    shuffle: bool = True,
    modalities: Sequence[str] = DEFAULT_MODALITIES,
    missing_strategy: str = "zero_fill",
    target_size=(128, 128, 128),
    num_workers: int = 4,
    is_training: bool = True,
    data_type: str = "BPH",
    indices: Optional[Sequence[int]] = None,
    normalize: str = "percentile",
    cache_dir: Optional[str] = None,
    drop_last: bool = False,
    seed: int = 0,
    n_classes: int = 1,
    coregister: bool = False,
) -> DataLoader:
    """One loader factory used uniformly by every trainer/validator.

    This is the unified keyword surface that fixes the reference's
    ``get_dataloader`` signature drift (SURVEY.md §8.1) — same core kwargs
    as data_loader.py:421-423, plus normalize/cache/seed.
    """
    dataset = ProstateDataset(
        data_dir=data_dir,
        data_type=data_type,
        modalities=modalities,
        missing_strategy=missing_strategy,
        target_size=target_size,
        normalize=normalize,
        cache_dir=cache_dir,
        is_training=is_training,
        n_classes=n_classes,
        coregister=coregister,
    )
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        indices=indices,
        num_workers=num_workers,
        drop_last=drop_last,
        seed=seed,
    )


def background_prefetch(iterator, depth: int = 2):
    """Run any iterator in a producer thread, keeping ``depth`` items ready.

    Used by the trainer to overlap host-side decode + H2D transfer of the
    next batch with the device computing the current step.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    err: list = []

    def producer():
        try:
            for item in iterator:
                q.put(item)
        except Exception as e:  # noqa: BLE001
            err.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def prefetch_to_device_concurrent(
    iterator, sharding=None, workers: int = 2, depth: int = 3
):
    """Device prefetch with ``workers`` concurrent H2D transfers.

    Over a tunneled/remote backend one ``jax.device_put`` streams at the
    link's single-request rate and dominates the epoch (BENCH.md
    "End-to-end training throughput"); issuing the next transfers while
    the current one is in flight pipelines the link. Batches are yielded
    strictly in order. Single-process only — multi-host global batches
    need lockstep construction across processes.
    """
    import jax

    from collections import deque as _deque
    from concurrent.futures import ThreadPoolExecutor as _Pool

    def put(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                s = sharding(v) if callable(sharding) else sharding
                out[k] = (
                    jax.device_put(v, s) if s is not None else jax.device_put(v)
                )
            else:
                out[k] = v
        # block in the worker so the yield below hands over a
        # transfer-complete batch (otherwise ordering gains nothing)
        jax.block_until_ready(
            [a for a in out.values() if isinstance(a, jax.Array)]
        )
        return out

    with _Pool(max_workers=max(1, workers)) as pool:
        pending = _deque()
        it = iter(iterator)
        for item in itertools.islice(it, max(1, depth)):
            pending.append(pool.submit(put, item))
        while pending:
            f = pending.popleft()
            nxt = next(it, None)
            if nxt is not None:
                pending.append(pool.submit(put, nxt))
            yield f.result()


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Move batches to device ahead of consumption (double buffering).

    Wraps a host-batch iterator; up to ``size`` batches are resident in HBM
    before the consumer asks. With a ``NamedSharding`` the transfer also
    shards the batch across the mesh.
    """
    import jax

    def put(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                out[k] = (
                    jax.device_put(v, sharding)
                    if sharding is not None
                    else jax.device_put(v)
                )
            else:
                out[k] = v
        return out

    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))
    sentinel = object()
    err: list = []

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        except Exception as e:  # noqa: BLE001
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
