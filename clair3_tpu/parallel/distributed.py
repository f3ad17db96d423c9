"""Multi-host (pod-slice) execution hooks.

The reference scales training across nodes with torchrun + NCCL DDP
(reference: clair3/Train.py:28-31,622-644) and scales calling across
machines only by manually splitting contigs.  The TPU-native equivalents:

* ``init_distributed`` — opt-in ``jax.distributed.initialize`` wrapper.
  After it returns, ``jax.devices()`` spans every process in the slice and
  one ``Mesh`` over it gives the same single-program data parallelism the
  single-host path uses (train/step.py works unchanged: the jit program's
  psum rides ICI within a host and DCN across hosts, inserted by XLA).
* ``own_tasks`` — process-local chunk ownership for the calling pipeline:
  genome chunks are strided across processes, each process writes its own
  output directory, and one final ``sort_vcf`` over the per-process VCFs
  produces the merged result (the filesystem contract the reference's
  GNU-parallel fan-out already established).
* ``global_batch`` — assemble a globally-sharded batch from each
  process's local slice (``jax.make_array_from_process_local_data``).

Smoke-tested with two CPU processes in tests/test_distributed.py; on a
real pod slice, pass the coordinator address of process 0 (or rely on the
TPU runtime's auto-bootstrap, where ``initialize()`` needs no arguments).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> Tuple[int, int]:
    """Opt-in multi-process initialization; returns (process_index,
    process_count).  With no arguments on a TPU pod slice, the cluster is
    discovered from the TPU runtime environment; on CPU/GPU clusters pass
    the coordinator explicitly (reference analogue: the NCCL
    init_process_group + RANK/WORLD_SIZE env contract, Train.py:28-31)."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def own_tasks(tasks: Sequence, process_id: int, process_count: int) -> List:
    """Strided process-local ownership of an ordered task list (chunks are
    size-homogeneous, so striding balances load like the reference's
    round-robin GNU-parallel dispatch)."""
    if process_count <= 1:
        return list(tasks)
    return [t for i, t in enumerate(tasks) if i % process_count == process_id]


def global_batch(mesh, x_local: np.ndarray):
    """Assemble a batch sharded over the GLOBAL mesh data axis from this
    process's local rows (every process contributes len(x_local) rows; the
    global batch is process_count * len(x_local))."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, x_local)
