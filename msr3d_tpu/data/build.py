"""Dataset/dataloader builders (reference data/build.py:76-100).

``build_dataloader_leo(cfg, dataset_name, wrapper_name, wrapper_args,
loader_args, split)`` keeps the reference signature; the loader itself is a
host-side iterator (shuffling sampler + wrapper collate) — single-process
by default with an optional thread-prefetch (the TPU step overlaps host
work with device compute; the reference's num_workers is 0 in shipped
configs too, configs/msr3d.yaml:162-169)."""

from __future__ import annotations

import multiprocessing
import queue
import threading
from typing import Dict, Iterator, List

import numpy as np

# worker-process globals (fork start method: the dataset is inherited by
# reference, never pickled — the torch DataLoader worker model)
_WORKER_DATASET = None
_WORKER_COLLATE = None


def _worker_init(dataset, collate_fn):
    global _WORKER_DATASET, _WORKER_COLLATE
    _WORKER_DATASET = dataset
    _WORKER_COLLATE = collate_fn


def _worker_load(chunk: List[int]):
    return _WORKER_COLLATE([_WORKER_DATASET[i] for i in chunk])

from msr3d_tpu.registry import DATASET_REGISTRY, DATASETWRAPPER_REGISTRY

# registration side effects
from msr3d_tpu.data.datasets import dataset_wrapper as _dw  # noqa: F401
from msr3d_tpu.data.datasets import msr3d as _msr3d  # noqa: F401


def _register_optional_datasets() -> None:
    # sqa3d / one_step_navi / legacy import lazily (they pull the scan loader)
    from msr3d_tpu.data.datasets import default as _default  # noqa: F401
    from msr3d_tpu.data.datasets import nmr as _nmr  # noqa: F401
    from msr3d_tpu.data.datasets import one_step_navi as _osn  # noqa: F401
    from msr3d_tpu.data.datasets import scannet_legacy as _legacy  # noqa: F401
    from msr3d_tpu.data.datasets import scannet_mv as _mv  # noqa: F401
    from msr3d_tpu.data.datasets import sqa3d as _sqa  # noqa: F401


class DataLoader:
    """Minimal host dataloader: sampler + collate (+ thread prefetch).

    Multi-host: ``num_shards``/``shard_id`` give each process a disjoint
    strided slice of the (globally-identical, seed-deterministic) sample
    order — torch DistributedSampler semantics (the reference's
    production multi-node data path via ``accelerator.prepare``,
    reference trainer/leo_trainer.py:128-139):

      - train (``drop_last=True``): the global order is truncated to a
        multiple of ``num_shards`` (tail samples dropped), so every
        shard yields the same number of samples and the collective train
        step never deadlocks on unequal batch counts.
      - eval: the global order is wrap-padded to a multiple, so shards
        stay equal-length; ``padded_tail`` reports how many trailing
        samples of THIS shard are wrap-around duplicates — the eval loop
        drops them before metric gathering, matching the reference's
        ``gather_for_metrics`` remainder truncation
        (reference common/misc.py:150-184).
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 4,
        shuffle: bool = False,
        drop_last: bool = False,
        collate_fn=None,
        seed: int = 42,
        prefetch: int = 2,
        num_workers: int = 0,
        num_shards: int = 1,
        shard_id: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn or (lambda x: x)
        self.seed = seed
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.epoch = 0
        assert 0 <= shard_id < num_shards, (shard_id, num_shards)
        self.num_shards = num_shards
        self.shard_id = shard_id

    def _shard_samples(self) -> int:
        """Samples this shard yields per epoch (equal across shards)."""
        n = len(self.dataset)
        if self.num_shards <= 1:
            return n
        if self.drop_last:
            return n // self.num_shards
        return -(-n // self.num_shards)

    @property
    def padded_tail(self) -> int:
        """How many of this shard's trailing samples are wrap-around
        duplicates (eval padding) — 0 or 1 with strided assignment."""
        n = len(self.dataset)
        if self.num_shards <= 1 or self.drop_last or n % self.num_shards == 0:
            return 0
        return 1 if self.shard_id >= n % self.num_shards else 0

    def __len__(self) -> int:
        n = self._shard_samples()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> List[int]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            # same seed on every process → identical global permutation;
            # the shard slice below is what differs per process
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.num_shards > 1:
            k = self.num_shards
            if self.drop_last:
                idx = idx[: (n // k) * k]
            elif n % k:
                idx = np.concatenate([idx, idx[: k - n % k]])
            idx = idx[self.shard_id :: k]
        return idx.tolist()

    def _batches(self) -> Iterator[List[int]]:
        idx = self._indices()
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self):
        if self.num_workers > 0:
            yield from self._iter_workers()
            return
        if self.prefetch <= 0:
            for chunk in self._batches():
                yield self.collate_fn([self.dataset[i] for i in chunk])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            # exceptions must reach the consumer — a silently-dead producer
            # would otherwise truncate the epoch to an empty iterator
            try:
                for chunk in self._batches():
                    q.put(self.collate_fn([self.dataset[i] for i in chunk]))
                q.put(sentinel)
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                q.put(exc)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                t.join()
                raise item
            yield item
        t.join()


    def _iter_workers(self):
        """Multiprocess batch loading — the reference's torch DataLoader
        ``num_workers`` model (SURVEY §3.1 worker-process boundary).

        Fork-started worker processes inherit the dataset by reference
        (no per-item pickling of the dataset itself); each worker loads +
        collates whole batches; ``imap`` preserves batch order and keeps
        ``num_workers`` batches in flight. Raw-scan preprocessing
        (ScanDataLoader → preprocess_pcd) is where this pays — the C++
        host-geometry path is 1.72 ms/scene single-core (BASELINE.md),
        and a b80 serving box feeding 60×1024-pt scenes wants cores."""
        ctx = multiprocessing.get_context("fork")
        with ctx.Pool(
            self.num_workers,
            initializer=_worker_init,
            initargs=(self.dataset, self.collate_fn),
        ) as pool:
            yield from pool.imap(_worker_load, self._batches())


class GrainDataLoader:
    """grain-backed loader (optional alternative to the thread loader):
    deterministic global shuffling + multi-worker prefetch via
    ``grain.MapDataset`` when heavier host parallelism is wanted."""

    def __init__(self, dataset, batch_size=4, shuffle=False, drop_last=False,
                 collate_fn=None, seed=42, num_workers=0):
        import grain.python as grain

        self._grain = grain
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn or (lambda x: x)
        self.seed = seed
        self.num_workers = num_workers
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        grain = self._grain
        ds = grain.MapDataset.source(self.dataset)
        if self.shuffle:
            ds = ds.shuffle(seed=self.seed + self.epoch)
        if getattr(self, "num_shards", 1) > 1:
            ds = ds[self.shard_id :: self.num_shards]
        it = ds.to_iter_dataset(
            grain.ReadOptions(num_threads=max(self.num_workers, 1), prefetch_buffer_size=4)
        )
        batch = []
        for item in it:
            batch.append(item)
            if len(batch) == self.batch_size:
                yield self.collate_fn(batch)
                batch = []
        if batch and not self.drop_last:
            yield self.collate_fn(batch)


def build_dataloader_leo(
    cfg, dataset_name: str, dataset_wrapper_name: str,
    dataset_wrapper_args, dataloader_args, split: str,
) -> DataLoader:
    """Reference contract (data/build.py:92-100): build dataset → chain
    wrapper → DataLoader with the wrapper's collate."""
    _register_optional_datasets()
    dataset = DATASET_REGISTRY.get(dataset_name)(cfg, split)
    wrapper = dataset
    if dataset_wrapper_name:
        wrapper = DATASETWRAPPER_REGISTRY.get(dataset_wrapper_name)(
            cfg, dataset, dataset_wrapper_args
        )
    collate = getattr(wrapper, "collate_fn", None)
    loader_cls = (
        GrainDataLoader
        if dataloader_args.get("backend", "") == "grain"
        else DataLoader
    )
    # multi-host: every process loads only its own shard (the reference's
    # DistributedSampler-through-accelerate path, launch_utils.py:45-60)
    import jax

    kw = {}
    if jax.process_count() > 1 and loader_cls is DataLoader:
        kw = dict(num_shards=jax.process_count(), shard_id=jax.process_index())
    return loader_cls(
        wrapper,
        batch_size=dataloader_args.get("batchsize", 4),
        shuffle=(split == "train"),
        drop_last=(split == "train"),
        collate_fn=collate,
        seed=int(cfg.get("rng_seed", 42)),
        num_workers=dataloader_args.get("num_workers", 0),
        **kw,
    )


def build_task_loaders(cfg) -> Dict[str, Dict[str, DataLoader]]:
    """Build every task×split loader from the config's task table
    (leo_trainer.py:79-96 semantics: train tasks get train loaders; val/
    test modes get eval loaders)."""
    loaders: Dict[str, Dict[str, DataLoader]] = {}
    for task_name, task_cfg in cfg.get("task", {}).items():
        modes = list(task_cfg.get("mode", []))
        dataset_name = task_cfg.dataset
        wrapper_name = task_cfg.get("dataset_wrapper", "")
        wrapper_args = task_cfg.get("dataset_wrapper_args", {})
        loaders[task_name] = {}
        for mode in modes:
            args_key = "train_dataloader_args" if mode == "train" else "eval_dataloader_args"
            loader_args = task_cfg.get(args_key, {"batchsize": 4})
            loaders[task_name][mode] = build_dataloader_leo(
                cfg, dataset_name, wrapper_name, wrapper_args, loader_args, mode
            )
    return loaders
