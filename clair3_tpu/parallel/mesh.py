"""Device mesh + batch sharding utilities.

The reference's parallelism is process fan-out over genome chunks plus
file-sharded multi-GPU inference (SURVEY.md §2.7).  The TPU-native design
replaces all of that with ONE jit-compiled program sharded over a
``jax.sharding.Mesh`` data axis: every chip computes a slice of each
statically-padded candidate batch, and XLA inserts the (trivial) collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(devices: Optional[Sequence] = None, n_devices: Optional[int] = None,
             local: bool = True) -> Mesh:
    """A 1-D data-parallel mesh over the available devices.

    ``local=True`` (default) uses this process's own devices — correct for
    the inference engines, whose host batches are process-local (multi-host
    calling shards GENOME chunks across processes, parallel/distributed.py,
    so each process feeds only its own chips).  Multi-host TRAINING wants
    the global slice mesh: pass ``local=False`` (cli.cmd_train) so the jit
    step's psum rides ICI+DCN across every process."""
    if devices is None:
        devices = jax.local_devices() if local else jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int) -> tuple:
    """Pad the batch axis up to a multiple; returns (padded, original_n)."""
    n = x.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x, n
    pad = np.zeros((target - n,) + x.shape[1:], dtype=x.dtype)
    return np.concatenate([x, pad], axis=0), n


def shard_batch(mesh: Mesh, x: np.ndarray):
    """Place a host batch onto the mesh, sharded along the data axis."""
    return jax.device_put(x, batch_sharding(mesh))
