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


def make_local_mesh(axis: str = "data") -> Mesh:
    """Mesh over this process's own devices only.

    For per-host computations in a multi-process run — e.g. evaluation
    decode, where each host processes its own loader shard and only the
    integer tallies are reduced across hosts (all_reduce_report).  A
    global mesh would misinterpret each host's local batch as the whole
    global batch.  Identical to make_mesh() in single-process runs.
    """
    return Mesh(np.asarray(jax.local_devices()), (axis,))


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




def all_reduce_metrics(tree):
    """Sum metric pytrees across processes (multi-host eval aggregation)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree).sum(axis=0)
