"""Host-side batch iteration with background prefetch + device transfer.

Replaces the reference's ``torch.utils.data.DataLoader(batch_size=32,
shuffle=True, num_workers=4, drop_last=...)`` plumbing (SURVEY.md §2.1).
Batches are assembled as numpy on the host and ``jax.device_put`` with the
requested sharding ahead of consumption (double buffering), so the
host->device copy overlaps the previous step's compute.

Three layers, composable:

* ``host_batch_iterator`` — pure-host numpy batch assembly (shuffle,
  drop-last / pad+mask), the analogue of the reference's Dataset+Sampler.
* ``device_batches`` — generic device stage: optional K-stacking for
  ``lax.scan`` trainers ([K, B, ...] groups, one transfer per group),
  sharded ``device_put``, threaded prefetch (the ``--workers`` knob).
* ``batch_iterator`` — the one-call convenience wrapping both (the
  reference's ``DataLoader`` surface).

``cycling_host_batches`` reproduces the reference adversarial trainer's
unlabeled-stream semantics: an iterator that reshuffles and restarts
whenever exhausted (``upstream:train_adversarial*.py``'s
``try: next(loader_iter) except StopIteration: loader_iter = iter(loader)``
pattern), with its position persisting across labeled epochs.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Sequence, Tuple

import jax
import numpy as np


def host_batch_iterator(arrays: Sequence[np.ndarray], batch_size: int,
                        shuffle: bool = True, drop_last: bool = True,
                        seed: int = 0, epoch: int = 0,
                        ) -> Iterator[Tuple[np.ndarray, ...]]:
    """Yield numpy batch tuples from parallel host arrays.

    ``drop_last=True`` matches the reference's training loader (keeps every
    batch shape static for XLA); with ``False`` (eval) EVERY batch gets a
    boolean validity mask appended (all-True for full batches; the final
    ragged batch is padded up to ``batch_size`` with pad rows masked out) —
    constant tuple arity for consumers.

    Row selection delegates to ``host_index_iterator`` — ONE source of
    truth for the permutation stream, so the device-data path (which
    gathers ``pool[idx]`` on device from the index twin) is
    bit-identical by construction.
    """
    n = arrays[0].shape[0]
    for item in host_index_iterator(n, batch_size, shuffle, drop_last,
                                    seed, epoch):
        if drop_last:
            yield tuple(a[item] for a in arrays)
        else:
            idx, mask = item
            yield tuple(a[idx] for a in arrays) + (mask,)


def cycling_host_batches(arrays: Sequence[np.ndarray], batch_size: int,
                         seed: int = 0, start_epoch: int = 0,
                         ) -> Iterator[Tuple[np.ndarray, ...]]:
    """Infinite shuffled host batches: reshuffle + restart on exhaustion.

    The reference's unlabeled-stream iterator for adversarial training
    cycles like this, its position persisting across labeled epochs.
    """
    pass_idx = start_epoch
    while True:
        yield from host_batch_iterator(arrays, batch_size, shuffle=True,
                                       drop_last=True, seed=seed,
                                       epoch=pass_idx)
        pass_idx += 1


def host_index_iterator(n: int, batch_size: int, shuffle: bool = True,
                        drop_last: bool = True, seed: int = 0,
                        epoch: int = 0) -> Iterator:
    """THE permutation stream: ``[batch_size]`` int32 row-index batches.

    ``host_batch_iterator`` gathers rows from these on the host; the
    device-resident data path ships them as-is and gathers ``pool[idx]``
    inside the jitted step — same indices, bit-identical batches.

    ``drop_last=True`` yields bare index vectors. ``drop_last=False``
    yields ``(idx, mask)`` pairs (the final ragged batch is padded with
    row 0 and the pad rows masked out; full batches get all-True masks) —
    a consumer without the mask could not distinguish pad rows from a
    genuine row-0 occurrence."""
    n_ = int(n)
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    order = rng.permutation(n_) if shuffle else np.arange(n_)
    for start in range(0, n_, batch_size):
        idx = order[start:start + batch_size]
        if len(idx) < batch_size:
            if drop_last:
                return
            mask = np.concatenate([np.ones(len(idx), bool),
                                   np.zeros(batch_size - len(idx), bool)])
            idx = np.concatenate(
                [idx, np.zeros(batch_size - len(idx), idx.dtype)])
        else:
            mask = np.ones(batch_size, bool)
        yield (idx.astype(np.int32) if drop_last
               else (idx.astype(np.int32), mask))


def cycling_host_indices(n: int, batch_size: int, seed: int = 0,
                         start_epoch: int = 0) -> Iterator[np.ndarray]:
    """Index-only twin of ``cycling_host_batches`` (same index stream)."""
    pass_idx = start_epoch
    while True:
        yield from host_index_iterator(n, batch_size, shuffle=True,
                                       drop_last=True, seed=seed,
                                       epoch=pass_idx)
        pass_idx += 1


def device_batches(host_batches: Iterable[Tuple[np.ndarray, ...]],
                   sharding: Optional[jax.sharding.Sharding] = None,
                   k_stack: int = 0, prefetch: int = 2,
                   ) -> Iterator[Tuple[Tuple[jax.Array, ...], bool]]:
    """Device stage: optional K-stacking, sharded transfer, prefetch.

    Yields ``(batch_tuple, stacked)`` pairs. With ``k_stack > 1``,
    consecutive host batches are grouped and stacked to ``[K, B, ...]``
    (``stacked=True``) for scan-based trainers — one host->device transfer
    per K steps; a final partial group is yielded as plain single batches
    (``stacked=False``) so the consumer never sees a ragged K.
    """
    def gen():
        if k_stack > 1:
            group = []
            for batch in host_batches:
                group.append(batch)
                if len(group) == k_stack:
                    stacked = tuple(np.stack(parts)
                                    for parts in zip(*group))
                    yield _put(stacked, sharding, batch_axis=1), True
                    group = []
            for batch in group:  # ragged tail -> single steps
                yield _put(batch, sharding, batch_axis=0), False
        else:
            for batch in host_batches:
                yield _put(batch, sharding, batch_axis=0), False

    return _prefetched(gen(), prefetch)


def batch_iterator(arrays: Sequence[np.ndarray], batch_size: int,
                   shuffle: bool = True, drop_last: bool = True,
                   seed: int = 0, epoch: int = 0,
                   sharding: Optional[jax.sharding.Sharding] = None,
                   prefetch: int = 2,
                   ) -> Iterator[Tuple[jax.Array, ...]]:
    """Device-resident batch tuples — ``host_batch_iterator`` + transfer
    + prefetch in one call (the reference's ``DataLoader`` surface)."""
    host = host_batch_iterator(arrays, batch_size, shuffle, drop_last,
                               seed, epoch)
    for batch, _ in device_batches(host, sharding, k_stack=0,
                                   prefetch=prefetch):
        yield batch


def num_batches(n: int, batch_size: int, drop_last: bool = True) -> int:
    return n // batch_size if drop_last else -(-n // batch_size)


def _put(batch, sharding, batch_axis: int):
    if sharding is None:
        return tuple(jax.device_put(a) for a in batch)
    return tuple(
        jax.device_put(a, _fit_rank(sharding, a.ndim, batch_axis))
        for a in batch)


def _prefetched(gen: Iterator, prefetch: int) -> Iterator:
    """Run ``gen`` in a producer thread, ``prefetch`` items ahead."""
    if prefetch <= 0:
        yield from gen
        return
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _SENTINEL = object()

    def producer():
        try:
            for item in gen:
                q.put(item)
            q.put(_SENTINEL)
        except BaseException as e:  # propagate to the consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def _fit_rank(sharding: jax.sharding.Sharding, ndim: int, batch_axis: int = 0):
    """Adapt a batch sharding to an array's rank (labels are rank 1-2) and
    batch-axis position (K-stacked batches carry the batch at axis 1)."""
    if isinstance(sharding, jax.sharding.NamedSharding):
        spec = [None] * batch_axis + list(sharding.spec) + [None] * ndim
        return jax.sharding.NamedSharding(
            sharding.mesh, jax.sharding.PartitionSpec(*spec[:ndim]))
    return sharding
