"""Host data loader: batch packing + background prefetch.

Replaces the reference's ``DataLoader(num_workers=8)`` + ``DistributedSampler``
(``conan_fgw/src/data/datamodules.py:61-77``): batches are packed with the
native C++ packer when available and prefetched on a background thread so the
host pipeline overlaps with device steps. Multi-host runs consume the same
global batch stream on every host and shard per batch at device-put time
(``parallel.mesh.shard_batch``); ``shard_range`` remains for host-local work
splitting (e.g. offline featurisation fan-out).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np

from conan_fgw_tpu.data.packing import MoleculeRecord, PackedBatch, pack_batch

try:
    from conan_fgw_tpu.data.native import native_available, pack_batch_native
except Exception:  # pragma: no cover
    def native_available():
        return False


def pack(records, **kw) -> PackedBatch:
    if native_available():
        return pack_batch_native(records, **kw)
    return pack_batch(records, **kw)


def shard_range(n: int, process_index: int, process_count: int) -> range:
    """Contiguous per-host shard (analog of DistributedSampler(shuffle=False))."""
    per = (n + process_count - 1) // process_count
    start = process_index * per
    return range(start, min(start + per, n))


def batches(
    records: Sequence[MoleculeRecord],
    batch_size: int,
    max_atoms: int,
    *,
    shuffle: bool = False,
    rng: np.random.Generator | None = None,
) -> Iterator[PackedBatch]:
    idx = np.arange(len(records))
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    for s in range(0, len(idx), batch_size):
        chunk = [records[i] for i in idx[s : s + batch_size]]
        yield pack(chunk, max_atoms=max_atoms, batch_size=batch_size)


def bucketed_batches(
    records: Sequence[MoleculeRecord],
    batch_size: int,
    *,
    buckets=None,
    shuffle: bool = False,
    rng: np.random.Generator | None = None,
) -> Iterator[PackedBatch]:
    """Atom-count-bucketed batching: group molecules by padded size so each
    compiled step shape wastes minimal padding (SURVEY §7 "bucketing").

    At most ``len(buckets)`` distinct shapes reach XLA. Batch composition
    differs from the reference's sequential order — opt-in.
    """
    from conan_fgw_tpu.data.packing import DEFAULT_BUCKETS, bucket_for

    buckets = buckets or DEFAULT_BUCKETS
    groups: dict[int, list[MoleculeRecord]] = {}
    for r in records:
        groups.setdefault(bucket_for(r.num_atoms, buckets), []).append(r)
    order = list(groups)
    if shuffle:
        rng = rng or np.random.default_rng()
        rng.shuffle(order)
        for g in groups.values():
            rng.shuffle(g)
    for b in order:
        g = groups[b]
        for s in range(0, len(g), batch_size):
            yield pack(g[s : s + batch_size], max_atoms=b, batch_size=batch_size)


def bucket_order(records: Sequence[MoleculeRecord], buckets=None) -> list[int]:
    """The record permutation ``bucketed_batches(shuffle=False)`` emits:
    groups in first-seen bucket order, records in input order within each.
    Callers that align per-record outputs (predictions, embeddings) with
    their input records must reindex through this."""
    from conan_fgw_tpu.data.packing import DEFAULT_BUCKETS, bucket_for

    buckets = buckets or DEFAULT_BUCKETS
    groups: dict[int, list[int]] = {}
    for i, r in enumerate(records):
        groups.setdefault(bucket_for(r.num_atoms, buckets), []).append(i)
    return [i for b in groups for i in groups[b]]


class Prefetcher:
    """Wrap a batch iterator with an N-deep background prefetch queue."""

    def __init__(self, iterator: Iterator, depth: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._thread = threading.Thread(target=self._fill, args=(iterator,), daemon=True)
        self._thread.start()

    def _fill(self, iterator):
        try:
            for item in iterator:
                self._queue.put(item)
        except BaseException as e:  # propagate to the consumer
            self._err = e
        finally:
            self._queue.put(None)

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is None:
                if self._err is not None:
                    raise self._err
                return
            yield item


def prefetched_batches(records, batch_size, max_atoms, *, shuffle=False, rng=None, depth=2):
    return Prefetcher(
        batches(records, batch_size, max_atoms, shuffle=shuffle, rng=rng), depth=depth
    )


def prefetched_bucketed_batches(
    records, batch_size, *, buckets=None, shuffle=False, rng=None, depth=2
):
    return Prefetcher(
        bucketed_batches(records, batch_size, buckets=buckets, shuffle=shuffle, rng=rng),
        depth=depth,
    )
