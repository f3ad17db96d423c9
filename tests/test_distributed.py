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


# 4-process virtual cluster (1 device each): ONE mesh-sharded train step
# from deterministic global data; every process must see the same loss and
# the same updated parameters as a SINGLE-process 4-device run of the same
# program (VERDICT r03 #7: parity vs single-process, not just cross-process
# agreement).
WORKER4 = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    nproc = int(sys.argv[3])
    ndev = 4 // nproc
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from clair3_tpu.parallel.distributed import global_batch, init_distributed

    port, pid = sys.argv[1], int(sys.argv[2])
    if nproc > 1:
        idx, count = init_distributed(
            coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
            process_id=pid)
        assert (idx, count) == (pid, nproc)
    devs = jax.devices()
    assert len(devs) == 4, devs

    from jax.sharding import Mesh
    mesh = Mesh(np.array(devs), ("data",))

    from clair3_tpu.models import PileupNet
    from clair3_tpu.train.step import (create_train_state, make_train_step,
                                       shard_train_state)
    rng = np.random.default_rng(5)
    X = rng.integers(-20, 20, (8, 33, 18)).astype(np.int32)
    Y = np.zeros((8, 90), np.float32)
    Y[:, 0] = Y[:, 21] = Y[:, 24 + 16] = Y[:, 57 + 16] = 1
    rows = 8 // nproc
    x_local = X[pid * rows:(pid + 1) * rows]
    y_local = Y[pid * rows:(pid + 1) * rows]

    model = PileupNet(add_indel_length=False)
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.asarray(X[:2]), learning_rate=1e-3)
    state = shard_train_state(state, mesh)
    step = make_train_step(model, tx, add_indel_length=False,
                           has_batch_stats=False, mesh=mesh)
    gx = global_batch(mesh, x_local)
    gy = global_batch(mesh, y_local)
    state, loss = step(state, gx, gy, jax.random.PRNGKey(1))
    fp = float(jax.jit(lambda k: jnp.abs(k).sum())(state.params["L4"]["kernel"]))
    print("OK4", pid, float(loss), fp, flush=True)
""")


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
def test_four_process_train_step_matches_single_process(tmp_path):
    """4 processes x 1 device vs 1 process x 4 devices: identical loss and
    identical post-update parameters from the same global batch."""
    script = tmp_path / "worker4.py"
    script.write_text(WORKER4)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}

    def launch(nproc):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(port), str(pid), str(nproc)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env, cwd="/root/repo")
            for pid in range(nproc)
        ]
        results = {}
        for p in procs:
            try:
                out, err = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail(f"{nproc}-process cluster timed out")
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
            tok = next(l for l in out.splitlines() if l.startswith("OK4")).split()
            results[int(tok[1])] = (float(tok[2]), float(tok[3]))
        return results

    ref = launch(1)[0]
    four = launch(4)
    assert len(four) == 4
    for pid, (loss, fp) in four.items():
        assert loss == pytest.approx(ref[0], rel=1e-5), (pid, loss, ref[0])
        assert fp == pytest.approx(ref[1], rel=1e-6), (pid, fp, ref[1])


@pytest.mark.slow
def test_dist_cli_os_processes_merge_identically(tmp_path):
    """End-to-end `--dist_*` equivalence at the CLI level (VERDICT r03 #7,
    deepened per r04 #9): FOUR separate `python -m clair3_tpu call` OS
    processes (a real jax.distributed localhost cluster, one CPU device
    each) call their owned chunks with the committed TRAINED fixture nets,
    gVCF on; `sort_vcf` over the per-process VCFs must be byte-identical
    to one single-process CLI run, and `sort_vcf --gvcf` over the
    per-process gVCFs must reproduce the single-process merged gVCF —
    full text, header included (the global phase_qual / gVCF interaction
    under chunk ownership is exactly what this pins)."""
    import gzip

    from clair3_tpu.models.params_io import save_variables
    from clair3_tpu.testing import (SimVariant, load_trained_fixture,
                                    random_reference, write_test_case)

    try:
        vp = load_trained_fixture("pileup_hifi.npz")
        vf = load_trained_fixture("fa_hifi.npz")
    except FileNotFoundError:
        pytest.skip("trained fixtures not generated yet "
                    "(scripts/train_fixture_checkpoints.py)")
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    save_variables(str(model_dir / "pileup.npz"), vp)
    save_variables(str(model_dir / "full_alignment.npz"), vf)

    L = 24_000
    ref = random_reference(L, seed=93)
    variants = []
    for p in range(600, L - 600, 900):
        kind = (p // 900) % 3
        if kind == 0:
            variants.append(SimVariant(p, ref[p], "A" if ref[p] != "A" else "C",
                                       (0, 1)))
        elif kind == 1:
            variants.append(SimVariant(p, ref[p], ref[p] + "GT", (1, 1)))
        else:
            variants.append(SimVariant(p, ref[p:p + 2], ref[p], (0, 1)))
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=L, variants=variants, coverage=20,
        read_length=900, seed=93, error_rate=0.02)

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # CLAIR3T_JAX_PLATFORM (not JAX_PLATFORMS): this image's sitecustomize
    # re-pins JAX_PLATFORMS=axon inside every subprocess, and the config
    # value wins once the plugin registers — the CLI-level override is the
    # only reliable way to force the CLI subprocesses onto CPU.
    env["CLAIR3T_JAX_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # one persistent XLA cache for all five CLI invocations: the single-
    # process run populates it, the dist processes reuse it (they compile
    # the same static-bucket programs)
    env["CLAIR3T_COMPILE_CACHE"] = str(tmp_path / "xla_cache")

    N_PROCS = 4

    def cli_call(out_dir, tag, extra):
        # stdout/stderr go to files, not pipes: four concurrent processes
        # on one oversubscribed core can fill a 64 KB pipe and deadlock
        # against the sequential communicate() below (each process blocks
        # in jax.distributed shutdown until ALL reach exit)
        log = open(str(tmp_path / f"{tag}.log"), "w")
        p = subprocess.Popen(
            [sys.executable, "-m", "clair3_tpu", "call",
             "--platform", "hifi", "--bam_fn", bam, "--ref_fn", fasta,
             "--model_path", str(model_dir), "--output_dir", out_dir,
             "--threads", "2", "--chunk_size", "6000", "--gvcf"] + extra,
            stdout=log, stderr=subprocess.STDOUT, env=env, cwd="/root/repo")
        p._log_path = str(tmp_path / f"{tag}.log")
        return p

    def wait_ok(p, what, timeout):
        try:
            p.wait(timeout=timeout)
        finally:
            log = open(p._log_path).read()
        assert p.returncode == 0, f"{what} failed:\n{log}"

    # generous timeouts: the whole test runs ~14 min on this image's one
    # idle shared vCPU, but a loaded machine (another suite/soak running)
    # has been seen to push a single CLI call past 25 min
    single_p = cli_call(str(tmp_path / "single"), "single", [])
    wait_ok(single_p, "single-process call", 2400)

    port = _free_port()
    dist = [
        cli_call(str(tmp_path / "dist"), f"dist{pid}",
                 ["--dist_coordinator", f"127.0.0.1:{port}",
                  "--dist_num_processes", str(N_PROCS),
                  "--dist_process_id", str(pid)])
        for pid in range(N_PROCS)
    ]
    for pid, p in enumerate(dist):
        wait_ok(p, f"dist call {pid}", 3000)

    shard_outs = [str(tmp_path / "dist" / f"proc{i}" / "merge_output.vcf.gz")
                  for i in range(N_PROCS)]
    for s in shard_outs:
        assert os.path.exists(s), s
    merged_fn = str(tmp_path / "merged.vcf.gz")

    def run_sort(inputs, output, extra=()):
        p = subprocess.Popen(
            [sys.executable, "-m", "clair3_tpu", "sort_vcf",
             "--input_fn"] + inputs +
            ["--output_fn", output, "--ref_fn", fasta] + list(extra),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd="/root/repo")
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"sort_vcf failed:\n{out}\n{err}"

    run_sort(shard_outs, merged_fn)

    def rows(path):
        return [l for l in gzip.open(path, "rt") if not l.startswith("#")]

    merged = rows(merged_fn)
    want = rows(str(tmp_path / "single" / "merge_output.vcf.gz"))
    assert merged == want
    assert len(merged) > 10
    # every shard did real work (4 chunks of 6 kb, one per process)
    for s in shard_outs:
        assert rows(s)

    # gVCF: merge the per-process shards (blocks close at chunk
    # boundaries, so concatenation+sort reconstructs the stream) and
    # demand the FULL single-process gVCF back — header included
    gvcf_shards = [str(tmp_path / "dist" / f"proc{i}" / "merge_output.gvcf.gz")
                   for i in range(N_PROCS)]
    for s in gvcf_shards:
        assert os.path.exists(s), s
    merged_gvcf = str(tmp_path / "merged.gvcf.gz")
    run_sort(gvcf_shards, merged_gvcf, ["--gvcf"])
    single_gvcf = str(tmp_path / "single" / "merge_output.gvcf.gz")

    def full_text(path):
        return gzip.open(path, "rt").read()

    assert full_text(merged_gvcf) == full_text(single_gvcf)
    n_gvcf_rows = sum(1 for l in full_text(merged_gvcf).splitlines()
                      if l and not l.startswith("#"))
    assert n_gvcf_rows > len(merged), "gVCF must carry non-variant blocks"


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
