"""Device mesh + sharding layer.

The reference explicitly rejects multi-device execution
(ctu/parsers/base_parser.py:236 raises NotImplementedError on >1 GPU;
DataParallel commented out at pix2pixHD_networks/models.py:22-23). Here
distribution is first-class and TPU-native (SURVEY.md §2.2 plan):

  * ``data`` axis — batch (DP). Params stay replicated; XLA's SPMD
    partitioner inserts the gradient all-reduces over ICI.
  * ``spatial`` axis — the H dimension of activations (the conv-model analog
    of sequence/context parallelism). Convs on H-sharded activations get
    their halo exchanges inserted by GSPMD; InstanceNorm's (H, W) reductions
    become cross-shard collectives automatically.

Everything rides ``jax.sharding.Mesh`` + NamedSharding through ``jax.jit`` —
no hand-written collectives on the training path (Pallas ring primitives
live in ops/pallas for custom kernels).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, spatial) mesh. Default: all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    if n_data is None or n_data <= 0:
        if n_dev % n_spatial:
            raise ValueError(f"{n_dev} devices not divisible by spatial={n_spatial}")
        n_data = n_dev // n_spatial
    if n_data * n_spatial != n_dev:
        raise ValueError(
            f"mesh {n_data}x{n_spatial} != {n_dev} devices"
        )
    dev_array = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def mesh_from_config(parallel_cfg, devices=None) -> Optional[Mesh]:
    """Build the mesh requested by a ParallelConfig, or None for the default
    single-device path. Multi-chip is opt-in: engage when ``data_axis > 0``
    (explicit DP degree) or ``spatial_axis > 1`` (H-axis activation sharding);
    ``data_axis == -1`` then means 'all remaining devices'. This replaces the
    reference's --gpu_ids flag surface (base_parser.py:110), which rejected
    >1 device (base_parser.py:236)."""
    p = parallel_cfg
    if p.data_axis <= 0 and p.spatial_axis <= 1:
        return None
    devices = list(devices if devices is not None else jax.devices())
    n_spatial = max(1, p.spatial_axis)
    n_data = p.data_axis if p.data_axis > 0 else max(1, len(devices) // n_spatial)
    need = n_data * n_spatial
    if len(devices) < need:
        raise ValueError(
            f"parallel config requests a {n_data}x{n_spatial} (data x spatial) "
            f"mesh but only {len(devices)} devices are visible"
        )
    return make_mesh(n_data, n_spatial, devices[:need])


_warned_replicated: set = set()


def warn_replicated_once(key: str, axis: str, msg: str):
    """One-shot (per key+axis) warning for the silent-replication perf
    cliff. Shared with distributed.make_global_batch_flexible so both the
    single-host and multi-host flexible paths surface the degradation."""
    if (key, axis) in _warned_replicated:
        return
    _warned_replicated.add((key, axis))
    import warnings

    warnings.warn(msg)


def shard_batch_flexible(batch: Dict, mesh: Mesh, shard_spatial: bool = True) -> Dict:
    """Place a host batch onto the mesh: B over 'data' when divisible (else
    replicated — e.g. the reference-protocol batch-1 eval), H (axis 1) over
    'spatial' when divisible. Host-only fields must be stripped first.

    The replication fallback is a silent perf cliff (every device computes
    the full batch), so the first time a non-divisible dim degrades to
    replication a one-shot warning is emitted per (key, axis)."""
    n_data = mesh.shape[DATA_AXIS]
    n_spatial = mesh.shape[SPATIAL_AXIS]
    out = {}
    for k, v in batch.items():
        # keep jax.Arrays as-is: device_put reshards on-device (and no-ops
        # when the sharding already matches — makes _place idempotent, so a
        # prefetched pre-placed batch is NOT round-tripped through the host)
        arr = v if isinstance(v, jax.Array) else np.asarray(v)
        spec = [None] * arr.ndim
        if arr.ndim >= 1 and n_data > 1:
            if arr.shape[0] % n_data == 0:
                spec[0] = DATA_AXIS
            else:
                warn_replicated_once(
                    k, "data",
                    f"batch field {k!r}: dim 0 ({arr.shape[0]}) not divisible "
                    f"by data axis ({n_data}); replicating — every device "
                    f"computes the full batch",
                )
        if shard_spatial and arr.ndim >= 3 and n_spatial > 1:
            if arr.shape[1] % n_spatial == 0:
                spec[1] = SPATIAL_AXIS
            else:
                warn_replicated_once(
                    k, "spatial",
                    f"batch field {k!r}: dim 1 ({arr.shape[1]}) not divisible "
                    f"by spatial axis ({n_spatial}); H stays unsharded",
                )
        out[k] = jax.device_put(arr, NamedSharding(mesh, P(*spec)))
    return out


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, shard_spatial: bool = True) -> NamedSharding:
    """Sharding for a batch array: B over 'data', H (axis 1) over 'spatial'."""
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if shard_spatial and ndim >= 3:
        spec[1] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch: Dict, mesh: Mesh, shard_spatial: bool = True) -> Dict:
    """Place a host batch dict onto the mesh with (data, spatial) sharding."""
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        out[k] = jax.device_put(arr, batch_sharding(mesh, arr.ndim, shard_spatial))
    return out


def make_sharded_train_step(step_fn, mesh: Mesh, shard_spatial: bool = True):
    """Wrap an (state, batch, rng) -> (state, metrics) step with mesh
    shardings: state replicated, batch sharded (data, spatial), rng
    replicated. XLA inserts all collectives (psum for grads over 'data',
    halo exchanges for H-sharded convs over 'spatial')."""
    repl = replicated(mesh)

    def sharded(state, batch, rng):
        state = jax.device_put(state, repl)
        batch = {
            k: jax.device_put(
                np.asarray(v), batch_sharding(mesh, np.asarray(v).ndim, shard_spatial)
            )
            for k, v in batch.items()
        }
        rng = jax.device_put(rng, repl)
        return step_fn(state, batch, rng)

    return sharded


def make_sharded_infer(infer_fn, mesh: Mesh, shard_spatial: bool = True):
    """Wrap an (params, mstate, batch) -> image inference fn with mesh
    shardings — multi-chip batch/spatial-parallel serving (params replicated,
    activations H-sharded; GSPMD handles the conv halos)."""
    repl = replicated(mesh)

    def sharded(params, mstate, batch):
        params = jax.device_put(params, repl)
        mstate = jax.device_put(mstate, repl) if mstate else mstate
        batch = {
            k: jax.device_put(
                np.asarray(v), batch_sharding(mesh, np.asarray(v).ndim, shard_spatial)
            )
            for k, v in batch.items()
        }
        return infer_fn(params, mstate, batch)

    return sharded
