"""Remote inference serving: EngineServer + RemoteEngine + CLI wiring.

The reference's remote-inference capability is its Triton gRPC client
mode (clair3/CallVariantsFromCffi.py:201-214); here the serving TPU host
runs `clair3_tpu serve` and calling hosts pass --remote_engines."""

import threading

import numpy as np
import pytest

from clair3_tpu.serve import EngineServer, RemoteEngine


@pytest.fixture()
def real_engines():
    import jax

    from clair3_tpu.models import FullAlignmentNet, PileupNet
    from clair3_tpu.pipeline.engine import InferenceEngine

    pileup = PileupNet(add_indel_length=False)
    vp = pileup.init(jax.random.PRNGKey(0),
                     np.zeros((2, 33, 18), np.int32))
    pe = InferenceEngine(pileup, vp, buckets=(32,), transfer_dtype=np.int16,
                         pileup_compact=True)
    fa = FullAlignmentNet(add_indel_length=True)
    vf = fa.init(jax.random.PRNGKey(0), np.zeros((2, 89, 33, 8), np.int8),
                 train=False)
    fe = InferenceEngine(fa, vf, buckets=(32,), depth_crop=True,
                         fa_compact=True)
    fe.fa_input_channels = 8
    return pe, fe


def test_remote_predict_identical_to_local(real_engines):
    pe, fe = real_engines
    server = EngineServer({"pileup": pe, "full_alignment": fe})
    server.serve_background()
    try:
        rp = RemoteEngine(server.address, "pileup")
        rf = RemoteEngine(server.address, "full_alignment")
        assert rf.fa_input_channels == 8  # propagated through /info
        rng = np.random.default_rng(0)
        x = rng.integers(-30, 30, (17, 33, 18)).astype(np.int32)
        np.testing.assert_array_equal(rp.predict(x), pe.predict(x))
        xf = rng.integers(-100, 100, (9, 89, 33, 8)).astype(np.int8)
        np.testing.assert_array_equal(rf.predict(xf), fe.predict(xf))
        # async protocol: handles -> gather, same rows
        probs = rf.gather(rf.predict_async(xf))
        np.testing.assert_array_equal(probs, fe.predict(xf))
    finally:
        server.shutdown()


def test_remote_engine_error_surfacing(real_engines):
    pe, _ = real_engines
    server = EngineServer({"pileup": pe}, platform="ont")
    server.serve_background()
    try:
        # fail-fast at construction: the server must host the kind ...
        with pytest.raises(RuntimeError, match="does not serve"):
            RemoteEngine(server.address, "full_alignment")
        # ... and a declared platform must match the client's
        with pytest.raises(RuntimeError, match="platform"):
            RemoteEngine(server.address, "pileup", platform="hifi")
        RemoteEngine(server.address, "pileup", platform="ont")  # ok
        # server-side prediction errors surface with the remote detail
        missing = RemoteEngine(server.address, "pileup")
        missing.kind = "nope"
        with pytest.raises(Exception):
            missing.predict(np.zeros((1, 33, 18), np.int32))
    finally:
        server.shutdown()


def test_concurrent_clients_consistent(real_engines):
    """The server behind the engine's submitter thread must serve parallel
    clients without cross-talk."""
    pe, _ = real_engines
    server = EngineServer({"pileup": pe})
    server.serve_background()
    rng = np.random.default_rng(1)
    batches = [rng.integers(-30, 30, (5 + i, 33, 18)).astype(np.int32)
               for i in range(6)]
    want = [pe.predict(b) for b in batches]
    got = [None] * len(batches)
    errs = []

    def worker(i):
        try:
            got[i] = RemoteEngine(server.address, "pileup").predict(batches[i])
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    try:
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(batches))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
    finally:
        server.shutdown()


def test_many_concurrent_clients_coalesce_byte_identically(real_engines):
    """N=12 (>8) concurrent clients: the per-kind _Coalescer must merge
    pending requests into fewer engine forwards (measured via /stats), and
    every client's rows must equal a solo engine.predict byte for byte
    (row-independent inference + shared bucket program)."""
    import json
    import urllib.request

    pe, _ = real_engines
    # wide collection window so the one-vCPU CI reliably coalesces
    server = EngineServer({"pileup": pe}, coalesce_window_s=0.2)
    server.serve_background()
    rng = np.random.default_rng(7)
    n_clients = 12
    batches = [rng.integers(-30, 30, (2 + (i % 5), 33, 18)).astype(np.int32)
               for i in range(n_clients)]
    want = [pe.predict(b) for b in batches]
    got = [None] * n_clients
    errs = []
    clients = [RemoteEngine(server.address, "pileup")
               for _ in range(n_clients)]  # /info round-trips up front
    start = threading.Barrier(n_clients)

    def worker(i):
        try:
            start.wait(timeout=30)
            got[i] = clients[i].predict(batches[i])
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    try:
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        with urllib.request.urlopen(server.address + "/stats",
                                    timeout=30) as r:
            stats = json.loads(r.read().decode())["pileup"]
        assert stats["requests"] == n_clients
        assert stats["rows"] == sum(b.shape[0] for b in batches)
        # coalescing actually happened: fewer forwards than requests
        assert stats["batches"] < n_clients, stats
    finally:
        server.shutdown()


def test_coalescer_groups_mismatched_shapes(real_engines):
    """Concurrent requests with DIFFERENT row shapes (e.g. two FA depths)
    must not concatenate; each group still returns correct rows."""
    _, fe = real_engines
    server = EngineServer({"full_alignment": fe}, coalesce_window_s=0.2)
    server.serve_background()
    rng = np.random.default_rng(8)
    shapes = [(3, 89, 33, 8), (4, 55, 33, 8), (2, 89, 33, 8)]
    batches = [rng.integers(-100, 100, s).astype(np.int8) for s in shapes]
    want = [fe.predict(b) for b in batches]
    got = [None] * len(batches)
    errs = []
    clients = [RemoteEngine(server.address, "full_alignment")
               for _ in batches]
    start = threading.Barrier(len(batches))

    def worker(i):
        try:
            start.wait(timeout=30)
            got[i] = clients[i].predict(batches[i])
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    try:
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(batches))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
    finally:
        server.shutdown()


def test_coalescer_oversized_single_request(real_engines):
    """One request larger than the coalescer's max_rows must still form a
    group of its own (regression: it previously matched nothing, leaving
    the dispatcher spinning and the client hung forever — the pipeline
    ships whole-chunk tensors, which can exceed any row cap)."""
    pe, _ = real_engines
    server = EngineServer({"pileup": pe}, coalesce_window_s=0.01)
    server._coalescers["pileup"].max_rows = 8
    server.serve_background()
    rng = np.random.default_rng(9)
    big = rng.integers(-30, 30, (20, 33, 18)).astype(np.int32)
    small = rng.integers(-30, 30, (3, 33, 18)).astype(np.int32)
    try:
        client = RemoteEngine(server.address, "pileup")
        np.testing.assert_array_equal(client.predict(big), pe.predict(big))
        # queue behind the oversized one still drains
        np.testing.assert_array_equal(client.predict(small),
                                      pe.predict(small))
    finally:
        server.shutdown()


def test_build_server_from_model_dir(tmp_path):
    """`clair3_tpu serve --model_path DIR` loads the same engines `call`
    builds, resolves .npz checkpoints, and serves them."""
    import jax

    from clair3_tpu.models import FullAlignmentNet, PileupNet
    from clair3_tpu.models.params_io import save_variables
    from clair3_tpu.serve import build_server

    pileup = PileupNet(add_indel_length=False)
    vp = pileup.init(jax.random.PRNGKey(0), np.zeros((2, 33, 18), np.int32))
    save_variables(str(tmp_path / "pileup.npz"), vp)
    fa = FullAlignmentNet(add_indel_length=True)
    vf = fa.init(jax.random.PRNGKey(0), np.zeros((2, 89, 33, 8), np.int8),
                 train=False)
    save_variables(str(tmp_path / "full_alignment.npz"), vf)

    server = build_server(str(tmp_path), compute_dtype="fp32")
    assert set(server.engines) == {"pileup", "full_alignment"}
    server.serve_background()
    try:
        rp = RemoteEngine(server.address, "pileup")
        x = np.random.default_rng(2).integers(
            -20, 20, (4, 33, 18)).astype(np.int32)
        np.testing.assert_array_equal(
            rp.predict(x), server.engines["pileup"].predict(x))
        assert RemoteEngine(server.address,
                            "full_alignment").fa_input_channels == 8
    finally:
        server.shutdown()


def test_cli_call_with_remote_engines(tmp_path):
    """Full cascade through --remote_engines == the oracle-served rows.

    The server hosts the oracle engines (deterministic), the CLI process
    runs extraction + decode only; merged rows must match a fully local
    oracle run byte for byte."""
    import gzip

    from clair3_tpu.cli import main
    from clair3_tpu.testing import (FullAlignmentOracleEngine,
                                    PileupOracleEngine, SimVariant,
                                    random_reference, write_test_case)

    L = 12000
    ref = random_reference(L, seed=21)
    variants = [
        SimVariant(2000, ref[2000], "C" if ref[2000] != "C" else "G", (1, 1)),
        SimVariant(4000, ref[4000], "T" if ref[4000] != "T" else "A", (0, 1)),
        SimVariant(6000, ref[6000], ref[6000] + "AG", (0, 1)),
        SimVariant(8000, ref[8000:8003], ref[8000], (1, 1)),
    ]
    write_test_case(str(tmp_path), ref_length=L, variants=variants,
                    coverage=25, read_length=1500, seed=21, error_rate=0.02)
    common = ["--bam_fn", str(tmp_path / "reads.bam"),
              "--ref_fn", str(tmp_path / "ref.fa"),
              "--no_phasing_for_fa", "--var_pct_full", "1.0",
              "--ref_pct_full", "1.0", "--threads", "1"]

    local_out = tmp_path / "local"
    assert main(["call", "--output", str(local_out),
                 "--use_oracle_engines"] + common) == 0

    server = EngineServer({"pileup": PileupOracleEngine(),
                           "full_alignment": FullAlignmentOracleEngine()})
    server.serve_background()
    try:
        remote_out = tmp_path / "remote"
        assert main(["call", "--output", str(remote_out),
                     "--remote_engines", server.address] + common) == 0
    finally:
        server.shutdown()

    def rows(p):
        with gzip.open(p, "rt") as f:
            return [l for l in f if not l.startswith("##")]

    for name in ("merge_output.vcf.gz", "pileup.vcf.gz",
                 "full_alignment.vcf.gz"):
        assert rows(local_out / name) == rows(remote_out / name), name
    body = [l for l in rows(remote_out / "merge_output.vcf.gz")
            if not l.startswith("#")]
    assert len(body) == len(variants)
