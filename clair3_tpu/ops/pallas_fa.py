"""Pallas TPU kernel: the full-alignment net's first conv as one banded
matmul.  STATUS: a documented NEGATIVE result, opt-in only
(CLAIR3T_ENABLE_FA_CONV1=1) — see scripts/bench_fa_conv1.py.

History: the FA net's conv1 is a 3x3/stride-2 convolution over an
8(9)-channel int8 input (reference architecture: clair3/model.py:282-416
``Clair3_F``).  A round-4 profile under a dead-code-prone measurement
loop attributed ~38% of the net's device time to this stage (lane-padding
hypothesis), motivating this kernel.  The round-5 re-measurement under
the honest staged-batch + full-output-sum loop shows XLA's own conv1 at
0.52 us/sample (14% of the 3.58 us/sample net) and this kernel at
1.49 us/sample — ~3x slower, because the band spends 792 reduction rows
per output where the conv needs 72 MACs (an 11x FLOP premium XLA's
native conv algorithm never pays).  The full net already sustains ~64%
MFU under plain XLA.  The kernel is numerically exact and compiles on
the real chip for all four 55/89 x 8/9 geometries; it is retained for
the reformulation technique and the measurement record.

This kernel reformulates the stage so the MXU sees one well-shaped matmul:

* the [D, W, C] sample is stored with (W, C) fused on lanes ([D, W*C]),
  so the tiny channel count never touches the lane padding;
* stride-2 row pairs are fused for free by one reshape
  ([Hp, W*C] -> [Hp/2, 2*W*C]): output row i needs input rows
  (2i-1, 2i, 2i+1) = pair[i] ++ pair[i+1][:W*C];
* the 3x3/stride-2 spatial structure moves into a precomputed BANDED
  weight matrix [3*W*C, Wout*F]: entry ((dy, cc, c), (j, f)) holds
  kernel[dy, cc-2j+1, c, f] when |cc - 2j| <= 1 and zero elsewhere, so
  out[i, j, f] = sum over the 3 fused rows x band = exactly the conv;
* /NORM input normalisation, the conv bias, the inference BatchNorm
  affine, and the ReLU are all folded into the band + a bias vector.

One [bt*Dout, 3*W*C] @ [3*W*C, Wout*F] matmul per batch tile (K=792,
N=1088 for the ONT 33x8 geometry) replaces XLA's padded conv: ~25x less
MXU work.  The band matrix is ~2 MB and is built once per jit trace.

Inference-only (no VJP); training keeps the flax ConvBNRelu path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 16 x 45 output rows = 720 matmul rows per tile; canvas + LHS + f32
# accumulator stay ~10 MB of the ~16 MB VMEM.
BATCH_TILE = 16


def _band_matrix(w_eff: jnp.ndarray, width: int) -> jnp.ndarray:
    """[3, 3, C, F] effective kernel -> [3*W*C, Wout*F] banded matrix.

    Row (dy, cc, c) x col (j, f): the stride-2 conv with padding 1 reads
    input column cc = 2j + dx - 1 for tap dx in {0,1,2}; taps that fall
    outside [0, W) multiply the zero pad and are simply absent from the
    band."""
    C, F = w_eff.shape[2], w_eff.shape[3]
    wout = -(-width // 2)
    entries = []
    for dy in range(3):
        for dx in range(3):
            for j in range(wout):
                cc = 2 * j + dx - 1
                if 0 <= cc < width:
                    entries.append((dy, cc, j, dx))
    idx = np.asarray(entries, np.int32)
    band = jnp.zeros((3, width, C, wout, F), w_eff.dtype)
    band = band.at[idx[:, 0], idx[:, 1], :, idx[:, 2], :].set(
        w_eff[idx[:, 0], idx[:, 3]])
    return band.reshape(3 * width * C, wout * F)


def _conv1_kernel(lhs01_ref, lhs2_ref, wb01_ref, wb2_ref, bb_ref, out_ref):
    """One batch tile: two banded matmuls + bias + ReLU.

    The caller pre-slices the stride-2 LHS operands in XLA (free reshapes
    there; Mosaic rejects both the pair-fusing shape cast and merging the
    sliced [bt, dout, K] back to 2-D in registers): lhs01 rows carry input
    rows (2i-1, 2i) fused on lanes, lhs2 carries row 2i+1.  The band matrix
    is split the same way, so the sum of the two matmuls is the full 3-row
    band product."""
    dt = wb01_ref.dtype
    acc = jax.lax.dot_general(
        lhs01_ref[...].astype(dt), wb01_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        lhs2_ref[...].astype(dt), wb2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + bb_ref[...].astype(jnp.float32), 0.0)
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "norm", "compute_dtype", "batch_tile",
                              "interpret"))
def fa_conv1_pallas(
    x: jnp.ndarray,        # [B, D, W, C] int8 (raw extractor tensor)
    kernel: jnp.ndarray,   # [3, 3, C, F]
    bias: jnp.ndarray,     # [F] conv bias
    gamma: jnp.ndarray,    # [F] BN scale
    beta: jnp.ndarray,     # [F] BN bias
    mean: jnp.ndarray,     # [F] BN running mean
    var: jnp.ndarray,      # [F] BN running variance
    eps: float = 1e-3,
    norm: float = 100.0,
    compute_dtype=jnp.bfloat16,
    batch_tile: int = BATCH_TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """relu(BN(conv2d(x / norm, kernel) + bias)) with stride 2 / padding 1
    on both spatial dims — the FA net's first ConvBNRelu at inference —
    returned as ``[B, ceil(D/2), ceil(W/2), F]`` in ``compute_dtype``."""
    B, D, W, C = x.shape
    F = kernel.shape[-1]
    dout, wout = -(-D // 2), -(-W // 2)
    wc = W * C
    dt = compute_dtype

    inv_std = gamma.astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + eps)
    w_eff = (kernel.astype(jnp.float32) * (inv_std / norm)).astype(dt)
    b_eff = (beta.astype(jnp.float32)
             + (bias.astype(jnp.float32) - mean.astype(jnp.float32)) * inv_std)
    wb = _band_matrix(w_eff, W)
    wb01, wb2 = wb[: 2 * wc], wb[2 * wc:]
    bb = jnp.tile(b_eff, wout)

    bt = min(batch_tile, max(8, B))
    pad = (-B) % bt
    # canvas row r = input row r-1 (rows 0 and D+1.. are the zero pad);
    # one free reshape fuses stride-2 row pairs: pair[k] = rows (2k-1, 2k),
    # so output row i reads pair[i] plus the first half of pair[i+1]
    hp = 2 * dout + 2
    x2 = jnp.pad(x.reshape(B, D, wc),
                 ((0, pad), (1, hp - D - 1), (0, 0)))
    Bp = B + pad
    pairs = x2.reshape(Bp, hp // 2, 2 * wc)
    lhs01 = pairs[:, 0:dout].reshape(Bp * dout, 2 * wc)
    lhs2 = pairs[:, 1:dout + 1, 0:wc].reshape(Bp * dout, wc)

    rows = bt * dout
    out = pl.pallas_call(
        _conv1_kernel,
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec((rows, 2 * wc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, wc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * wc, wout * F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wc, wout * F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wout * F,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, wout * F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * dout, wout * F), dt),
        interpret=interpret,
    )(lhs01, lhs2, wb01, wb2, bb)
    out = out.reshape(Bp, dout, wout * F)
    if pad:
        out = out[:B]
    return out.reshape(B, dout, wout, F)
