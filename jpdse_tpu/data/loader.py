"""Threaded, seeded data loader with device prefetch.

Replaces torch DataLoader (ctu/data/__init__.py:48-54) with a thread pool
(PIL decode and the codec binaries release the GIL / run out-of-process) plus
an async prefetch queue so host decode + base-codec work overlaps TPU compute
— the reference's biggest throughput sin was serializing a bpgenc/bpgdec
subprocess into every training step (SURVEY.md §2.1).

Semantics match the reference: shuffle and drop_last only in training, one
worker-count knob, per-epoch reseeding derived from (seed, epoch).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np


def collate(samples: List[Dict]) -> Dict:
    out: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key in ("path", "base_codec_streams", "base_codec_ext"):
            out[key] = vals  # host-side lists (paths / raw codec bitstreams)
        elif key == "base_codec_bytes":
            out[key] = np.asarray(vals, np.int64)
        else:
            out[key] = np.stack(vals)
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        seed: Optional[int] = None,
        prefetch: int = 2,
        rank: int = 0,
        world: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed if seed is not None else 0
        self.prefetch = prefetch
        self.epoch = 0
        # multi-host sharding: every host draws the SAME seeded permutation,
        # then keeps its rank-strided slice — disjoint per-host sample sets
        # with no coordination traffic
        self.rank = rank
        self.world = max(1, world)
        # meta_only: yield {"index", "flip", "path"} batches that replay the
        # exact seeded augmentation stream without loading pixels — consumed
        # by the device-resident dataset cache (data/device_cache.py)
        self.meta_only = False

    def _n_local(self) -> int:
        n = len(self.dataset)
        if self.world > 1:
            # padded so every rank sees the same count (see _index_batches)
            return -(-n // self.world)
        return n

    def __len__(self) -> int:
        n = self._n_local()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _index_batches(self) -> List[List[int]]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(idx)
        if self.world > 1:
            # Equalize per-rank counts BEFORE striding: every process must
            # run the same number of jitted train steps or the 'dcn'
            # gradient psum deadlocks when the short ranks move on (e.g.
            # 30 images on 4 hosts -> 8,8,7,7 local samples). Pad the
            # permutation by wrapping (torch DistributedSampler semantics)
            # so each rank gets exactly ceil(n/world) samples.
            pad = (-len(idx)) % self.world
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.rank :: self.world]
        batches = [
            list(idx[i : i + self.batch_size])
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        base_rng = np.random.default_rng((self.seed, self.epoch, 7))
        # one child seed per sample so augmentation is reproducible and
        # independent of worker scheduling
        sample_seeds = base_rng.integers(0, 2**63 - 1, size=len(self.dataset))

        def load_one(i: int) -> Dict:
            kwargs = {"meta_only": True} if self.meta_only else {}
            return self.dataset.__getitem__(
                i, rng=np.random.default_rng(int(sample_seeds[i])), **kwargs
            )

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                try:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(load_one, batch_idx))
                        q.put(collate(samples))
                except BaseException as e:  # forward worker errors to consumer
                    q.put(e)
                finally:
                    q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
        self.epoch += 1
