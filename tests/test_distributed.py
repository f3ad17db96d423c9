"""Two-process CPU smoke test for the multi-host hooks (VERDICT r02 #9).

Each subprocess initializes jax.distributed against a localhost
coordinator with 2 virtual CPU devices, builds ONE global mesh over the 4
global devices, runs a globally-sharded psum and one mesh-sharded train
step from each process's local batch slice, and checks process-local
chunk ownership is a disjoint cover.  This is the pod-slice execution
model with DCN swapped for localhost gRPC.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

from clair3_tpu.parallel.distributed import own_tasks

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from clair3_tpu.parallel.distributed import (
        global_batch, init_distributed, own_tasks)

    port, pid = sys.argv[1], int(sys.argv[2])
    idx, count = init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=pid)
    assert (idx, count) == (pid, 2), (idx, count)
    devs = jax.devices()
    assert len(devs) == 4, devs              # 2 procs x 2 local devices

    from jax.sharding import Mesh, PartitionSpec as P
    mesh = Mesh(np.array(devs), ("data",))

    # globally sharded reduction: every process contributes 2 rows
    local = np.full((2, 4), pid + 1, np.float32)
    gx = global_batch(mesh, local)
    assert gx.shape == (4, 4), gx.shape
    total = jax.jit(lambda a: a.sum())(gx)
    assert float(total) == (1 + 1 + 2 + 2) * 4, float(total)

    # one real train step over the global mesh from local slices
    from clair3_tpu.models import PileupNet
    from clair3_tpu.train.step import (create_train_state, make_train_step,
                                       shard_train_state)
    model = PileupNet(add_indel_length=False)
    x_local = np.random.default_rng(pid).integers(-20, 20, (4, 33, 18)).astype(np.int32)
    y_local = np.zeros((4, 90), np.float32)
    y_local[:, 0] = y_local[:, 21] = y_local[:, 24 + 16] = y_local[:, 57 + 16] = 1
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.asarray(x_local[:2]), learning_rate=1e-3)
    state = shard_train_state(state, mesh)
    step = make_train_step(model, tx, add_indel_length=False,
                           has_batch_stats=False, mesh=mesh)
    gx = global_batch(mesh, x_local)
    gy = global_batch(mesh, y_local)
    state, loss = step(state, gx, gy, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # chunk ownership: disjoint cover
    tasks = list(range(11))
    mine = own_tasks(tasks, idx, count)
    print("OK", idx, count, float(loss), len(mine), flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_own_tasks_disjoint_cover():
    tasks = list(range(17))
    parts = [own_tasks(tasks, i, 4) for i in range(4)]
    flat = sorted(t for p in parts for t in p)
    assert flat == tasks
    assert all(len(p) in (4, 5) for p in parts)
    assert own_tasks(tasks, 0, 1) == tasks


@pytest.mark.slow
def test_two_process_cpu_smoke(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd="/root/repo")
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
        assert "OK" in out, out
    # the two workers computed the SAME global loss from the same program
    ok_lines = [next(l for l in out.splitlines() if l.startswith("OK")).split()
                for _, out, _ in outs]
    losses = [float(l[3]) for l in ok_lines]
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    counts = [int(l[4]) for l in ok_lines]
    assert sorted(counts) == [5, 6]


@pytest.mark.slow
def test_multiprocess_calling_shards_merge_identically(tmp_path):
    """Chunk-ownership calling equivalence: two processes each calling
    their owned chunks (dist_process_id/count), merged by sort_vcf, must
    produce exactly the rows of a single-process run."""
    import gzip

    from clair3_tpu.config import CallConfig
    from clair3_tpu.pipeline.call import VariantCaller
    from clair3_tpu.testing import (FullAlignmentOracleEngine,
                                    PileupOracleEngine, SimVariant,
                                    random_reference, write_test_case)

    L = 30_000
    ref = random_reference(L, seed=91)
    variants = []
    for p in range(600, L - 600, 800):
        kind = (p // 800) % 3
        if kind == 0:
            variants.append(SimVariant(p, ref[p], "A" if ref[p] != "A" else "C",
                                       (0, 1)))
        elif kind == 1:
            variants.append(SimVariant(p, ref[p], ref[p] + "GT", (1, 1)))
        else:
            variants.append(SimVariant(p, ref[p:p + 2], ref[p], (0, 1)))
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=L, variants=variants, coverage=20,
        read_length=900, seed=91, error_rate=0.02)

    def call(out, pid=0, count=1):
        cfg = CallConfig(
            platform="hifi", bam_fn=bam, ref_fn=fasta, output_dir=out,
            no_phasing_for_fa=True, var_pct_full=1.0, ref_pct_full=1.0,
            chunk_size=7_000, threads=2,
            dist_process_id=pid, dist_process_count=count)
        return VariantCaller(cfg, pileup_engine=PileupOracleEngine(),
                             fa_engine=FullAlignmentOracleEngine()).run()

    single = call(str(tmp_path / "single"))
    shard0 = call(str(tmp_path / "p0"), 0, 2)
    shard1 = call(str(tmp_path / "p1"), 1, 2)

    def rows(path):
        return [l for l in gzip.open(path, "rt") if not l.startswith("#")]

    # merge with sort_vcf semantics (position dedup): chunk-BOUNDARY
    # candidates (e.g. an indel whose anchor window spans two chunks) are
    # emitted by the processes owning both neighbouring chunks, with
    # byte-identical rows — exactly like adjacent chunks within one process
    from clair3_tpu.pipeline.merge_sort import sort_rows

    r0, r1 = rows(shard0["merge_output"]), rows(shard1["merge_output"])
    merged = sort_rows(r0 + r1)
    want = rows(single["merge_output"])
    assert merged == want
    # shards are disjoint apart from boundary rows, and both non-trivial
    assert r0 and r1
    dup = {r.split("\t")[1] for r in r0} & {r.split("\t")[1] for r in r1}
    for pos in dup:
        a = [r for r in r0 if r.split("\t")[1] == pos]
        b = [r for r in r1 if r.split("\t")[1] == pos]
        assert a == b, f"boundary rows diverged at {pos}"
