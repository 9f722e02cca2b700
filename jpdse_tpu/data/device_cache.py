"""Device-resident dataset cache: upload every training sample to the TPU
once, then assemble each batch ON DEVICE (gather + flip), so steady-state
training performs zero per-step host->device pixel transfers.

Why (round 3, measured): the TPU relay client leaks the host-side copy of
every distinct host->device upload — a probe of 8 consecutive 25MB
``device_put``s grew process RSS by ~25MB each, and ``malloc_trim`` reclaimed
almost nothing. A flagship GAN run uploads ~23MB/batch (image+label+instance
at 1024x512), i.e. ~1.3GB/min of unreclaimable host RSS; a 600-epoch run
OOM-kills a 125GB host. Caching the ~22-image training set on device removes
the upload (and its ~0.2s relay round trip) from every step. This is also
the TPU-idiomatic shape for small-dataset training: HBM holds the dataset
(a few hundred MB), the host only ships (index, flip) integers.

Exactness: cached samples are produced by the dataset's own ``__getitem__``
with flip disabled, so decode, resize, normalize, and ``postprocess`` all run
the normal host path; the only on-device work is the flip itself (pure index
reversal along W) and stacking — bit-identical to the host-assembled batch.
The loader's meta mode (``DataLoader.meta_only``) replays the same seeded rng
stream the host path would consume, so the (index, flip) sequence is
identical to what host assembly would have produced.

Applies when: ``cache_images`` is active (deterministic fixed/none
preprocessing), single-process, and the whole set fits the HBM budget.
``use_compressed`` configs are covered too: base-codec outputs are not
flip-equivariant, so BOTH flip variants of ``compressed`` live on device
(selected by index), computed once through the dataset's memoized
``_compressed_arrays`` — this also removes the ~1.3s/image in-process HEVC
encode from the steady-state loop on this 1-CPU host. Anything else falls
back to the host path with a printed reason.

Reference counterpart: none — the reference re-decodes PNGs and re-uploads
every batch (ctu/data/ctu_dataset.py:91-116 + torch DataLoader H2D).
"""

from __future__ import annotations

import itertools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# per-modality stacked arrays cached on device; everything else is host-side
CACHE_KEYS = ("image", "label", "instance")


def _assemble(ds: Dict, idx, flip) -> Dict:
    """Gather samples ``idx`` from the stacked dataset arrays and flip the
    selected ones along W. jit-compiled once per batch size; the dataset
    arrays are ARGUMENTS (never closures — the remote-compile relay rejects
    graphs with large baked constants).

    ``compressed`` is special: base-codec artifacts are not flip-equivariant
    (codec(flip(x)) != flip(codec(x))), so both flip variants are stored
    ((2N, H, W, C), variant-major) and selected by index instead of flipped
    on device."""
    out = {}
    for k, v in ds.items():
        if k == "compressed":
            out[k] = jnp.take(v, idx * 2 + flip.astype(jnp.int32), axis=0)
            continue
        g = jnp.take(v, idx, axis=0)  # (B, H, W[, C])
        rev = g[:, :, ::-1]
        cond = flip.reshape((-1,) + (1,) * (g.ndim - 1))
        out[k] = jnp.where(cond, rev, g)
    return out


class DeviceDatasetCache:
    """Builds the on-device stacked dataset and assembles placed batches from
    loader meta batches ({"index", "flip", "path"})."""

    def __init__(self, dataset, cfg):
        self.dataset = dataset
        self.cfg = cfg
        n = len(dataset)
        # Build through the full host __getitem__ (normalize + postprocess
        # included) with flip forced off; cached entries differ from host
        # batches only by the flip, which is applied on device.
        no_flip_prev = cfg.data.no_flip
        cfg.data.no_flip = True
        try:
            samples = [
                dataset.__getitem__(i, rng=np.random.default_rng(0))
                for i in range(n)
            ]
        finally:
            cfg.data.no_flip = no_flip_prev
        host = {
            k: np.stack([s[k] for s in samples])
            for k in CACHE_KEYS
            if k in samples[0]
        }
        del samples
        if cfg.codec.use_compressed:
            # both flip variants, interleaved (i*2 + flip): the base-codec
            # round trip is memoized per (index, flip) by the dataset
            host["compressed"] = np.stack(
                [
                    dataset._compressed_arrays(i, f)[0]
                    for i in range(n)
                    for f in (False, True)
                ]
            )
        self.nbytes = sum(v.nbytes for v in host.values())
        self.ds = {k: jax.device_put(v) for k, v in host.items()}
        self._fn = jax.jit(_assemble)

    def place(self, meta_batch: Dict) -> Dict:
        idx = jnp.asarray(np.asarray(meta_batch["index"], np.int32))
        flip = jnp.asarray(np.asarray(meta_batch["flip"], bool))
        out = dict(self._fn(self.ds, idx, flip))
        out["path"] = meta_batch.get("path")
        return out


class CachedValBatches:
    """Device-resident validation batches: iterate the val loader ONCE,
    place each batch's array modalities on device, and replay the placed
    batches on every later validate / reconstruction-dump pass.

    Why: validation re-uploads the whole val set through the relay client
    every ``val_interval`` epochs, and the client leaks the host copy of
    each upload (measured ~125MB/min on the flagship recipes at
    val_interval=25 — the training-set DeviceDatasetCache had removed the
    per-STEP leak, this removes the per-VAL one). ``Trainer._place`` is
    idempotent on already-placed arrays, so replayed batches skip the H2D
    entirely; host fields (``path``, byte strings) pass through untouched.

    Exactness: eval never flips (``__getitem__`` applies flip only under
    ``is_train``) and the gate requires the dataset's deterministic cached
    preprocessing, so every val pass would have produced these exact
    arrays anyway."""

    def __init__(self, val_loader, cap: Optional[int] = None):
        self.batches = []
        self.nbytes = 0
        for i, batch in enumerate(val_loader):
            if cap is not None and i >= cap:
                break
            placed = {}
            for k, v in batch.items():
                if isinstance(v, np.ndarray) and v.dtype != object:
                    self.nbytes += v.nbytes
                    placed[k] = jax.device_put(v)
                else:
                    placed[k] = v
            self.batches.append(placed)

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def maybe_val_cache(
    val_loader, cfg, mesh=None, cap: Optional[int] = None, max_gb: float = 1.0
) -> Optional[CachedValBatches]:
    """Build a CachedValBatches when the config supports it, else None.
    Same gating as maybe_device_cache (opt-in flag, deterministic cached
    preprocessing, single process, no mesh — sharded/multi-host eval places
    batches per-shard in Trainer._place) plus an HBM budget estimated from
    the first batch."""
    if not getattr(cfg.data, "device_cache", False):
        return None

    def decline(reason: str):
        if cfg.data.cache_images:
            print(f"val device_cache unavailable: {reason}; using host batches")
        return None

    if not getattr(val_loader.dataset, "_cache_enabled", False):
        return decline("requires cache_images with deterministic preprocessing")
    if mesh is not None:
        return decline("mesh sharding places batches per-shard")
    if jax.process_count() > 1:
        return decline("multi-host feeds per-rank shards")
    # probe with the loader's own iterator and hand the probed batch plus
    # the SAME iterator to CachedValBatches — the first val batch (image
    # decode + preprocessing + base-codec round trip on a cold memo) is
    # built exactly once, not once for the probe and again for the cache
    it = iter(val_loader)
    try:
        first = next(it)
    except StopIteration:
        return decline("empty val set")
    per_batch = sum(
        v.nbytes
        for v in first.values()
        if isinstance(v, np.ndarray) and v.dtype != object
    )
    n = len(val_loader) if cap is None else min(len(val_loader), cap)
    if per_batch * n > max_gb * 1024**3:
        return decline(
            f"val set ~{per_batch * n / 1024**3:.2f}GB exceeds the "
            f"{max_gb}GB HBM budget"
        )
    cache = CachedValBatches(itertools.chain([first], it), cap=cap)
    print(
        f"val device_cache: {len(cache)} batches "
        f"({cache.nbytes / 1024**2:.0f}MB) resident on device; "
        f"validation H2D eliminated"
    )
    return cache


def maybe_device_cache(
    loader, cfg, mesh=None, max_gb: float = 2.0
) -> Optional[DeviceDatasetCache]:
    """Build a DeviceDatasetCache when the config supports it, else None
    (with a printed reason when the user opted into caching)."""
    if not getattr(cfg.data, "device_cache", False):
        return None

    def decline(reason: str):
        if cfg.data.cache_images:
            print(f"device_cache unavailable: {reason}; using host batches")
        return None

    dataset = loader.dataset
    if not getattr(dataset, "_cache_enabled", False):
        return decline("requires cache_images with deterministic preprocessing")
    if cfg.codec.use_compressed and not hasattr(dataset, "_compressed_arrays"):
        return decline("dataset cannot memoize base-codec round trips")
    if mesh is not None:
        return decline("mesh sharding places batches per-shard")
    if jax.process_count() > 1:
        return decline("multi-host feeds per-rank shards")
    n = len(dataset)
    try:
        dataset.__getitem__(0, rng=np.random.default_rng(0), meta_only=True)
    except TypeError:
        # dataset subclass overrides __getitem__ without meta replay support
        # (e.g. ADE20K's wholesale override)
        return decline(f"{type(dataset).__name__} does not support meta replay")
    probe = dataset.__getitem__(0, rng=np.random.default_rng(0))
    est = n * sum(np.asarray(probe[k]).nbytes for k in CACHE_KEYS if k in probe)
    if "compressed" in probe:
        est += 2 * n * np.asarray(probe["compressed"]).nbytes
    if est > max_gb * 1024**3:
        return decline(
            f"dataset ~{est / 1024**3:.2f}GB exceeds the {max_gb}GB HBM budget"
        )
    try:
        cache = DeviceDatasetCache(dataset, cfg)
    except ValueError as e:
        # e.g. preprocess_mode 'none' keeps per-image sizes, so a
        # variable-size folder dataset cannot be stacked into one device
        # array — fall back to host batches instead of killing the run
        return decline(f"samples are not stackable ({e})")
    print(
        f"device_cache: {n} samples ({cache.nbytes / 1024**2:.0f}MB) resident "
        f"on device; per-step H2D reduced to (index, flip)"
    )
    return cache
