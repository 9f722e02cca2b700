"""Device prefetch: overlap host->device transfer with TPU compute.

The loader yields numpy batches; this iterator eagerly device_puts the next
batch while the current one is being consumed by the (async-dispatched)
jitted step — the standard JAX input-pipeline double-buffer.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, Optional

import jax

DEVICE_KEYS = ("label", "instance", "image", "compressed")


def _put(batch: Dict, device=None, sharding=None) -> Dict:
    out = dict(batch)
    for k in DEVICE_KEYS:
        if k in out:
            if sharding is not None:
                out[k] = jax.device_put(out[k], sharding)
            elif device is not None:
                out[k] = jax.device_put(out[k], device)
            else:
                out[k] = jax.device_put(out[k])
    return out


def prefetch_to_device(
    iterable: Iterable[Dict], size: int = 2, device=None, sharding=None,
    place_fn=None,
) -> Iterator[Dict]:
    """Yield batches with up to ``size`` transfers in flight ahead.

    ``place_fn(batch) -> batch`` overrides the default placement — e.g. the
    trainer's mesh-aware sharding (Trainer._place)."""
    place = place_fn if place_fn is not None else (
        lambda b: _put(b, device, sharding)
    )
    queue = []
    it = iter(iterable)
    try:
        for _ in range(size):
            queue.append(place(next(it)))
    except StopIteration:
        pass
    while queue:
        nxt: Optional[Dict] = None
        try:
            nxt = place(next(it))
        except StopIteration:
            pass
        yield queue.pop(0)
        if nxt is not None:
            queue.append(nxt)
