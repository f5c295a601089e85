"""Device mesh + sharding helpers for data-parallel training.

The reference is single-process single-GPU (train_ctc.py:117; no
torch.distributed anywhere) — parallelism is a first-class addition here:
a 1-D ('data',) jax.sharding.Mesh, batches sharded over it, parameters
replicated, and XLA inserting the gradient psum over ICI/DCN.  The model
(~17-20M params) fits one chip many times over, so DP is the right (and
only useful) partitioning; TP/PP/SP are intentionally out of scope
(SURVEY.md §2.4).

Works identically on a real TPU slice and on the virtual
`--xla_force_host_platform_device_count=N` CPU mesh used by tests and the
driver's multi-chip dry run.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices <= 0:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_devices]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put every array leaf with its batch axis sharded.

    Single-process: a plain device_put.  Multi-process (real
    `jax.distributed` runs): each host passes its LOCAL rows and the
    global array is assembled with `make_array_from_process_local_data`
    — the global batch is the concatenation of the per-host shards in
    process order (each host's loader yields its shard_for_host slice,
    so together they cover the global batch exactly once).
    """
    sh = batch_sharding(mesh, axis)
    multiproc = jax.process_count() > 1

    def put(x):
        if isinstance(x, (np.ndarray, jax.Array)) and getattr(x, "ndim", 0) >= 1:
            if multiproc:
                return jax.make_array_from_process_local_data(
                    sh, np.asarray(x))
            return jax.device_put(x, sh)
        return x

    return jax.tree.map(put, tree)


def local_shard(x) -> np.ndarray:
    """Host-local rows of a batch-sharded global array.

    Multi-process arrays are only partially addressable: np.asarray on
    them raises.  This gathers the process's own shards (ordered by
    global row offset) — the rows this host contributed via shard_batch.
    """
    if not isinstance(x, jax.Array) or jax.process_count() == 1:
        return np.asarray(x)
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def all_reduce_metrics(tree):
    """Sum metric pytrees across processes (multi-host eval aggregation)."""
    if jax.process_count() == 1:
        return tree
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree).sum(axis=0)
