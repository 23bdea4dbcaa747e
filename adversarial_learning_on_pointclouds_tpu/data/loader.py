"""Host-side batch iteration with background prefetch + device transfer.

Replaces the reference's ``torch.utils.data.DataLoader(batch_size=32,
shuffle=True, num_workers=4, drop_last=...)`` plumbing (SURVEY.md §2.1).
Batches are assembled as numpy on the host and ``jax.device_put`` with the
requested sharding one step ahead of consumption (double buffering), so
the host->device copy overlaps the previous step's compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence, Tuple

import jax
import numpy as np


def batch_iterator(arrays: Sequence[np.ndarray], batch_size: int,
                   shuffle: bool = True, drop_last: bool = True,
                   seed: int = 0, epoch: int = 0,
                   sharding: Optional[jax.sharding.Sharding] = None,
                   prefetch: int = 2,
                   ) -> Iterator[Tuple[jax.Array, ...]]:
    """Yield device-resident batch tuples from parallel host arrays.

    ``drop_last=True`` matches the reference's training loader (keeps every
    batch shape static for XLA); pass ``False`` for eval, where the final
    ragged batch is padded up to ``batch_size`` and a boolean validity mask
    is appended to the tuple.
    """
    n = arrays[0].shape[0]
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    order = rng.permutation(n) if shuffle else np.arange(n)

    def host_batches():
        for start in range(0, n, batch_size):
            idx = order[start:start + batch_size]
            if len(idx) < batch_size:
                if drop_last:
                    return
                pad = np.zeros(batch_size - len(idx), dtype=idx.dtype)
                mask = np.concatenate([np.ones(len(idx), bool),
                                       np.zeros(len(pad), bool)])
                idx = np.concatenate([idx, pad])
                yield tuple(a[idx] for a in arrays) + (mask,)
            else:
                yield tuple(a[idx] for a in arrays)

    def put(batch):
        if sharding is not None:
            return tuple(jax.device_put(a, _fit_rank(sharding, a.ndim))
                         for a in batch)
        return tuple(jax.device_put(a) for a in batch)

    if prefetch <= 0:
        for batch in host_batches():
            yield put(batch)
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _SENTINEL = object()

    def producer():
        try:
            for batch in host_batches():
                q.put(put(batch))
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


def num_batches(n: int, batch_size: int, drop_last: bool = True) -> int:
    return n // batch_size if drop_last else -(-n // batch_size)


def _fit_rank(sharding: jax.sharding.Sharding, ndim: int):
    """Adapt a batch sharding to an array's rank (labels are rank 1-2)."""
    if isinstance(sharding, jax.sharding.NamedSharding):
        spec = list(sharding.spec) + [None] * ndim
        return jax.sharding.NamedSharding(
            sharding.mesh, jax.sharding.PartitionSpec(*spec[:ndim]))
    return sharding
