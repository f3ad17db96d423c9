#!/usr/bin/env python
"""FA conv1 Pallas-vs-XLA microbench on the real TPU — the measurement
behind the decision NOT to ship ops/pallas_fa.py as the default conv1.

Round-4 context: a profile under the dead-code-prone y[0,0] measurement
loop attributed ~38% of the FA net's device time to the 8-channel conv1
(lane-padding hypothesis), motivating the banded-matmul kernel.  This
script re-measures under the honest staged-batch + full-output-sum loop
(bench.py phase 1).  Result on v5e (2026-08, round 5):

    full net, XLA conv path:   279,693 cand/s   (3.58 us/sample)
    full net, Pallas conv1:    174,631 cand/s   (0.62x — SLOWER)
    conv1 stage alone, XLA:    0.517 us/sample  (= 14% of net, not 38%)
    conv1 stage alone, Pallas: 1.493 us/sample  (bt=16; bt>=32 VMEM-OOMs)

Why: the banded reformulation spends 792 reduction rows per output where
the conv needs 72 MACs (11x FLOP premium), and XLA's native conv never
pays the naive 8->128 lane padding the hypothesis assumed.  The full net
sustains ~0.45 GFLOP/sample * 279k/s = 126 TFLOP/s = ~64% of v5e's
197 TFLOP/s bf16 peak under plain XLA — roofline territory; conv1 is not
a lever.  The kernel stays available behind CLAIR3T_ENABLE_FA_CONV1=1
(cli._use_pallas_fa_conv1) as a documented negative result.

Usage: python scripts/bench_fa_conv1.py   (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from clair3_tpu.models import FullAlignmentNet
    from clair3_tpu.ops.pallas_fa import fa_conv1_pallas

    B, D, W, C = 2048, 89, 33, 8
    ITERS = 30
    dt = jnp.bfloat16

    def bench(apply_fn, x0):
        @jax.jit
        def run(x):
            def body(carry, i):
                xi = x + (i % 3).astype(x.dtype)
                return carry + apply_fn(xi), None
            total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    jnp.arange(ITERS))
            return total
        float(run(x0))  # compile + warmup (scalar fetch = axon sync)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    x0 = jax.device_put(np.random.RandomState(1).randint(
        -100, 100, (B, D, W, C)).astype(np.int8))
    net_off = FullAlignmentNet(add_indel_length=True, compute_dtype=dt)
    v = net_off.init(jax.random.PRNGKey(0), jnp.zeros((8, D, W, C), jnp.int8),
                     train=False)
    net_on = FullAlignmentNet(add_indel_length=True, compute_dtype=dt,
                              use_pallas_conv1=True)

    t_off = bench(lambda x: jnp.sum(
        net_off.apply(v, x, train=False).astype(jnp.float32)), x0)
    print(f"full net, XLA conv path:   {B * ITERS / t_off:,.0f} cand/s "
          f"({1e6 * t_off / ITERS / B:.2f} us/sample)")
    t_on = bench(lambda x: jnp.sum(
        net_on.apply(v, x, train=False).astype(jnp.float32)), x0)
    print(f"full net, Pallas conv1:    {B * ITERS / t_on:,.0f} cand/s "
          f"({t_off / t_on:.2f}x vs XLA)")

    p = v["params"]["conv1"]
    s = v["batch_stats"]["conv1"]["bn"]
    k, b = p["conv"]["kernel"], p["conv"]["bias"]
    g, be = p["bn"]["scale"], p["bn"]["bias"]
    mean, var = s["mean"], s["var"]

    def conv1_xla(x):
        xi = x.astype(dt) / 100.0
        y = jax.lax.conv_general_dilated(
            xi, k.astype(dt), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(
            (y + b - mean) * g * jax.lax.rsqrt(var + 1e-3) + be, 0)
        return jnp.sum(y.astype(jnp.float32))

    def conv1_pl(x):
        y = fa_conv1_pallas(x, k, b, g, be, mean, var, compute_dtype=dt,
                            batch_tile=16)
        return jnp.sum(y.astype(jnp.float32))

    for name, fn in (("conv1 stage alone, XLA", conv1_xla),
                     ("conv1 stage alone, Pallas bt=16", conv1_pl)):
        t = bench(fn, x0)
        print(f"{name}: {1e6 * t / ITERS / B:.3f} us/sample")

    flops = 0.45e9  # per sample, all conv stages + dense (hand count)
    print(f"net MFU under XLA: {flops * B * ITERS / t_off / 197e12:.0%} "
          f"of v5e bf16 peak")


if __name__ == "__main__":
    main()
