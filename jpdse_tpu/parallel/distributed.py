"""Multi-host (multi-process) initialization + DCN-aware meshes.

The reference is strictly single-process (SURVEY.md §2.2: no
torch.distributed anywhere; >1 GPU raises at base_parser.py:236). Here
multi-host runs are first-class and TPU-native:

  * ``initialize()`` wraps ``jax.distributed.initialize`` — on TPU pods the
    coordinator/process env is auto-detected; elsewhere (CPU smoke tests,
    GPU clusters) pass coordinator_address/num_processes/process_id or set
    the JPDSE_COORDINATOR / JPDSE_NUM_PROCESSES / JPDSE_PROCESS_ID env vars.
  * ``make_dcn_mesh()`` builds a (dcn, data, spatial) mesh whose leading axis
    spans *hosts/slices* (gradient all-reduce rides DCN) while data/spatial
    stay intra-slice on ICI — the standard slice-aware layout (the
    scaling-book recipe: keep the fat collectives on ICI, only the gradient
    psum crosses DCN).

Batches shard over the combined ('dcn', 'data') axes; params replicate.
``jax.make_array_from_process_local_data`` assembles global arrays from
per-host shards.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DCN_AXIS = "dcn"
DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: bool = False,
) -> bool:
    """Initialize jax.distributed (idempotent). Returns True when running
    multi-process, False for the common single-process case. ``auto`` defers
    entirely to JAX's environment auto-detection (TPU pods)."""
    global _initialized
    coordinator_address = coordinator_address or os.environ.get("JPDSE_COORDINATOR")
    if num_processes is None and "JPDSE_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JPDSE_NUM_PROCESSES"])
    if process_id is None and "JPDSE_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JPDSE_PROCESS_ID"])

    if not auto and coordinator_address is None and num_processes in (None, 1):
        return False  # single-process; nothing to do
    if not _initialized:
        if auto and coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        _initialized = True
    return jax.process_count() > 1


def make_dcn_mesh(
    n_data: Optional[int] = None, n_spatial: int = 1, devices=None
) -> Mesh:
    """(dcn, data, spatial) mesh: 'dcn' spans processes (slices), data/spatial
    subdivide each process's local devices. Requires homogeneous hosts."""
    devices = devices if devices is not None else jax.devices()
    n_proc = jax.process_count()
    n_local = len(devices) // n_proc
    if n_data is None or n_data <= 0:
        if n_local % n_spatial:
            raise ValueError(f"{n_local} local devices not divisible by spatial={n_spatial}")
        n_data = n_local // n_spatial
    if n_data * n_spatial != n_local:
        raise ValueError(f"per-host mesh {n_data}x{n_spatial} != {n_local} local devices")
    # jax.devices() orders by process; reshape keeps each host's devices
    # contiguous on the trailing (ICI) axes
    dev_array = np.asarray(devices).reshape(n_proc, n_data, n_spatial)
    return Mesh(dev_array, (DCN_AXIS, DATA_AXIS, SPATIAL_AXIS))


def dcn_batch_sharding(mesh: Mesh, ndim: int, shard_spatial: bool = True) -> NamedSharding:
    """Batch dim sharded over (dcn x data); H over spatial."""
    spec = [None] * ndim
    spec[0] = (DCN_AXIS, DATA_AXIS)
    if shard_spatial and ndim >= 3:
        spec[1] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def make_global_batch(batch: Dict, mesh: Mesh, shard_spatial: bool = True) -> Dict:
    """Assemble a global device array from each process's local batch shard
    (per-host input pipelines stay independent; the array is logically the
    concatenation over processes)."""
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        sharding = dcn_batch_sharding(mesh, arr.ndim, shard_spatial)
        out[k] = jax.make_array_from_process_local_data(sharding, arr)
    return out


def make_global_batch_flexible(
    batch: Dict, mesh: Mesh, shard_spatial: bool = True,
    local_is_shard: bool = True,
) -> Dict:
    """Like make_global_batch, but degrades per array exactly like
    mesh.shard_batch_flexible: batch dim shards over (dcn x data) only when
    the per-host batch divides the local data axis (else the array is
    REPLICATED); H shards over 'spatial' when divisible.

    ``local_is_shard`` states what the per-host batch IS. True (training):
    each host feeds a disjoint rank shard (data/__init__.py rank-strides the
    train sampler) and the global batch is their concatenation over 'dcn'.
    False (eval/serving): every host holds the SAME batch — the unsharded
    eval loaders — so the arrays are fully REPLICATED. Sharding identical
    copies over dcn would both duplicate the global batch and make the
    jitted outputs span non-addressable devices (np.asarray on a multi-host
    sharded array raises); full replication keeps every output locally
    fetchable, matching the "every host sees the same metric stream"
    contract."""
    n_data = mesh.shape[DATA_AXIS]
    n_spatial = mesh.shape[SPATIAL_AXIS]
    out = {}
    for k, v in batch.items():
        if isinstance(v, jax.Array):
            out[k] = v  # already global (prefetch pre-placed)
            continue
        arr = np.asarray(v)
        spec = [None] * arr.ndim
        if local_is_shard:
            from jpdse_tpu.parallel.mesh import warn_replicated_once

            if arr.ndim >= 1:
                if arr.shape[0] % n_data == 0:
                    spec[0] = (DCN_AXIS, DATA_AXIS)
                else:
                    warn_replicated_once(
                        k, "dcn_data",
                        f"batch field {k!r}: per-host dim 0 ({arr.shape[0]}) "
                        f"not divisible by local data axis ({n_data}); "
                        f"replicating — every device computes the full batch",
                    )
            if shard_spatial and arr.ndim >= 3 and n_spatial > 1:
                if arr.shape[1] % n_spatial == 0:
                    spec[1] = SPATIAL_AXIS
                else:
                    warn_replicated_once(
                        k, "dcn_spatial",
                        f"batch field {k!r}: dim 1 ({arr.shape[1]}) not "
                        f"divisible by spatial axis ({n_spatial}); H stays "
                        f"unsharded",
                    )
        sharding = NamedSharding(mesh, P(*spec))
        out[k] = jax.make_array_from_process_local_data(sharding, arr)
    return out
