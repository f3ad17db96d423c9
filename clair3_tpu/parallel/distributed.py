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
    idx, count = jax.process_index(), jax.process_count()
    if num_processes is not None and num_processes > 1 and count != num_processes:
        # A backend that was initialized before (or without) the cluster
        # handshake reports a single process; proceeding would silently run
        # every process as its own single-process job over the SAME output
        # directory (discovered via the CLI --dist_* path on a host whose
        # sitecustomize eagerly registers an accelerator backend).
        raise RuntimeError(
            f"requested num_processes={num_processes} but the jax backend "
            f"reports process_count={count}; the backend likely initialized "
            "before jax.distributed could join the cluster (on hosts that "
            "pin a platform eagerly, set CLAIR3T_JAX_PLATFORM to the "
            "intended platform so it is applied before backend init)")
    return idx, count


def own_tasks(tasks: Sequence, process_id: int, process_count: int) -> List:
    """Strided process-local ownership of an ordered task list (chunks are
    size-homogeneous, so striding balances load like the reference's
    round-robin GNU-parallel dispatch)."""
    if process_count <= 1:
        return list(tasks)
    return [t for i, t in enumerate(tasks) if i % process_count == process_id]


_BARRIER_SEQ = [0]


def _skew_barrier(timeout_s: int = 1800) -> None:
    """Wait until EVERY process reaches this point, via the coordination
    service (whose timeout is ours to choose).  The gloo CPU collectives
    backing ``process_allgather`` rendezvous with a fixed ~30 s deadline;
    processes reach the cutoff gather after data-dependent amounts of
    calling work, so on oversubscribed hosts (or skewed shards) peers can
    arrive minutes apart and the collective dies in context init.  The
    barrier bounds the skew the collective actually sees to microseconds."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        _BARRIER_SEQ[0] += 1
        client.wait_at_barrier(f"clair3t_gather_{_BARRIER_SEQ[0]}",
                               timeout_in_ms=timeout_s * 1000)


def gather_rowpack(pack):
    """All-gather the per-process (ctg, pos, qual, flags) row pack across
    every process in the cluster (concatenated in process order).

    float64 quals ride as uint32 bit-pairs: jax without x64 silently
    narrows f64/i64 arrays, and the quantile cutoffs must compare exactly
    equal to a single-process run's (a cutoff off by one f32 ulp flips the
    routing of the row that DEFINES the cutoff)."""
    import jax

    if jax.process_count() == 1:
        return pack
    _skew_barrier()
    from jax.experimental import multihost_utils as mh

    def gather_u32(u32: np.ndarray) -> np.ndarray:
        lens = np.asarray(mh.process_allgather(
            np.asarray([len(u32)], np.uint32)))[:, 0]
        m = max(int(lens.max()), 1)
        pad = np.zeros(m, np.uint32)
        pad[: len(u32)] = u32
        allv = np.asarray(mh.process_allgather(pad))
        return np.concatenate([allv[i, : int(lens[i])]
                               for i in range(len(lens))])

    ctg, pos, qual, flags = pack
    qbits = np.ascontiguousarray(qual, np.float64).view(np.uint32)
    return (gather_u32(ctg), gather_u32(pos),
            gather_u32(qbits).view(np.float64), gather_u32(flags))


def global_batch(mesh, x_local: np.ndarray):
    """Assemble a batch sharded over the GLOBAL mesh data axis from this
    process's local rows (every process contributes len(x_local) rows; the
    global batch is process_count * len(x_local))."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, x_local)
