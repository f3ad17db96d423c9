#!/usr/bin/env python
"""Re-measure every round's shipped forward configuration under the ONE
round-5 measurement loop, so docs/parity.md's capacity-history table is
methodology-comparable (VERDICT r04 item #2).

Why this exists: r03 timed fresh host RNG inside the loop (~36% of the FA
wall), r04 staged the batch but reduced only y[0, 0] (DCE-prone on
pure-conv graphs), r05 reduces over the full output.  Numbers quoted
across rounds were therefore NOT comparable.  This script re-runs the
*configurations* each round shipped — which all still exist in-tree, the
r04 gate-sigmoid form being reconstructed by swapping the one function
that changed — under `bench.bench_forward` (staged device batch,
per-iteration perturbation, full-output reduction, best-of-3).

Configurations (bf16, trained hifi fixture weights, real TPU):

  pileup r02/r03-entry  lax.scan BiLSTM + XLA heads (use_pallas_lstm=False)
  pileup r03-ship       Pallas fused trunk (pileup_trunk_pallas) + XLA heads
  pileup r04-ship       fully-fused net, logistic(exp)-form gate sigmoids
  pileup r05-ship       fully-fused net, tanh-form gate sigmoids (current)
  FA     r02..r05-ship  FullAlignmentNet XLA conv graph, ONT depth 89
                        (the FA forward config never changed)

Each pileup variant's probabilities are compared against the shipped
path on the same batch before timing (they are the same trained net; the
printed max-abs diff is bf16 noise), so the table can't silently time a
different computation.  Run on the real chip:

    python scripts/bench_history.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _stack_lstm(params, name):
    import jax.numpy as jnp

    layer = params[name]
    return tuple(
        jnp.stack([layer["fwd"][k], layer["bwd"][k]]) for k in ("wi", "wh", "b")
    )


class TrunkPallasXlaHeads:
    """r03's shipped composition: fused-trunk Pallas kernel + XLA head
    branches (mirrors the PileupNet XLA branch math head-for-head)."""

    def __init__(self, dt):
        self.dt = dt

    def apply(self, variables, x, train=False):
        import jax
        import jax.numpy as jnp

        from clair3_tpu.config import NO_OF_POSITIONS
        from clair3_tpu.ops.pallas_pileup import pileup_trunk_pallas

        p = variables["params"]
        wi1, wh1, b1 = _stack_lstm(p, "LSTM1")
        wi2, wh2, b2 = _stack_lstm(p, "LSTM2")
        h2 = wh2.shape[1]
        wd = p["L4"]["kernel"].reshape(NO_OF_POSITIONS, 2 * h2, -1)
        trunk = pileup_trunk_pallas(x, wi1, wh1, b1, wi2, wh2, b2,
                                    wd, p["L4"]["bias"],
                                    compute_dtype=self.dt,
                                    interpret=jax.default_backend() != "tpu")
        dt = self.dt
        outs = []
        for i, head in enumerate(("Y_gt21_logits", "Y_genotype_logits")):
            w5 = p[f"L5_{i + 1}"]["kernel"].astype(dt)
            b5 = p[f"L5_{i + 1}"]["bias"].astype(dt)
            h = jax.nn.selu(trunk.astype(dt) @ w5 + b5)
            logits = h @ p[head]["kernel"].astype(dt) + p[head]["bias"].astype(dt)
            outs.append(jax.nn.softmax(jax.nn.selu(logits.astype(jnp.float32))))
        return jnp.concatenate(outs, axis=-1)


def _logistic_gates(gates, c, state_dtype):
    """The r04-shipped gate form (exp-based logistic; replaced in r05 by the
    mathematically-identical tanh form, commit b37d9b6)."""
    import jax
    import jax.numpy as jnp

    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c.astype(jnp.float32) + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new.astype(state_dtype), c_new.astype(state_dtype)


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from clair3_tpu.models import FullAlignmentNet, PileupNet
    from clair3_tpu.ops import pallas_pileup
    from clair3_tpu.testing import load_trained_fixture
    from clair3_tpu.utils.common import enable_compilation_cache

    enable_compilation_cache()
    if jax.default_backend() != "tpu":
        print("WARNING: not on TPU; numbers are not the parity.md table",
              file=sys.stderr)

    dt = jnp.bfloat16
    vp = load_trained_fixture("pileup_hifi.npz")
    vf = load_trained_fixture("fa_hifi.npz")

    smoke = os.environ.get("C3T_HISTORY_SMOKE") == "1"  # CPU wiring check
    B_P, ITERS_P = (64, 2) if smoke else (8192, 30)
    B_F, ITERS_F = (16, 2) if smoke else (2048, 30)

    def stage_pileup():
        return jax.device_put(np.random.RandomState(0).randint(
            -30, 30, (B_P, 33, 18)).astype(np.int32))

    def stage_fa():
        return jax.device_put(np.random.RandomState(1).randint(
            -100, 100, (B_F, 89, 33, 8)).astype(np.int8))

    shipped = PileupNet(add_indel_length=False, compute_dtype=dt,
                        use_pallas_lstm=True)
    scan_net = PileupNet(add_indel_length=False, compute_dtype=dt,
                         use_pallas_lstm=False)
    trunk_net = TrunkPallasXlaHeads(dt)
    fa = FullAlignmentNet(add_indel_length=True, compute_dtype=dt)

    # sanity: every variant computes the same trained net (bf16 noise only)
    xs = stage_pileup()[:256]
    ref_out = np.asarray(shipped.apply(vp, xs, train=False))
    for name, m in (("scan", scan_net), ("trunk+xla", trunk_net)):
        d = float(np.abs(np.asarray(m.apply(vp, xs, train=False)) - ref_out).max())
        print(f"[history] {name} vs shipped: max-abs prob diff {d:.2e}",
              file=sys.stderr)
        assert d < 0.02, f"{name} diverged from the shipped net: {d}"

    rows = []

    def measure(label, model, variables, stage, batch, iters):
        cps = bench.bench_forward(model, variables, stage, batch, iters)
        rows.append((label, cps))
        print(f"[history] {label}: {cps:,.0f} cand/s", file=sys.stderr)
        return cps

    measure("pileup lax.scan + XLA heads (r02/r03 entry)",
            scan_net, vp, stage_pileup, B_P, ITERS_P)
    measure("pileup Pallas trunk + XLA heads (r03 ship)",
            trunk_net, vp, stage_pileup, B_P, ITERS_P)

    # r04's kernel differed from r05's ONLY in the gate-sigmoid lowering;
    # swap the module-level gate fn and clear the jit caches so the
    # pallas_call actually re-traces with the logistic form.
    orig = pallas_pileup._lstm_gates
    pallas_pileup.pileup_full_pallas.clear_cache()
    pallas_pileup._lstm_gates = _logistic_gates
    try:
        d = float(np.abs(np.asarray(shipped.apply(vp, xs, train=False))
                         - ref_out).max())
        print(f"[history] logistic-form vs shipped: max-abs prob diff {d:.2e}",
              file=sys.stderr)
        assert d < 0.02
        measure("pileup full-fusion, logistic-form gates (r04 ship)",
                shipped, vp, stage_pileup, B_P, ITERS_P)
    finally:
        pallas_pileup._lstm_gates = orig
        pallas_pileup.pileup_full_pallas.clear_cache()

    measure("pileup full-fusion, tanh-form gates (r05 ship)",
            shipped, vp, stage_pileup, B_P, ITERS_P)
    measure("FA XLA conv, ONT depth 89 (r02..r05 ship)",
            fa, vf, stage_fa, B_F, ITERS_F)

    print("\n| configuration | cand/s (r05 loop) |")
    print("|---|---|")
    for label, cps in rows:
        print(f"| {label} | {cps:,.0f} |")


if __name__ == "__main__":
    main()
