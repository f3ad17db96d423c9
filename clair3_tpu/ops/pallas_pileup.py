"""Pallas TPU kernel: the ENTIRE pileup-net trunk in one VMEM-resident pass.

Why: under XLA, the pileup net (reference: clair3/model.py:58-161) is
HBM-bound, not MXU-bound.  The two BiLSTM layers materialize their
pre-projected gate tensors (``[B, 33, 8H]`` per layer, ~1.2 GB of HBM
write+read per 8k batch) and round-trip the h/c carries through HBM on
every one of the 66 sequential steps.  Measured: ~19.4 ms per 8192 batch
(~10% MFU) with the recurrences taking ~15 ms.

This kernel instead grids over batch tiles and keeps *everything*
— input window, both recurrences, the layer-1 hidden sequence, and the
flattened Dense-128 trunk — in VMEM.  HBM traffic per batch drops to the
input (+weights once) and a ``[B, 128]`` trunk output; the input
projections are folded into each recurrence step as batched MXU matmuls.

Measured on v5e (B=8192, bf16): 1.12M candidates/s full-net vs 423k for
the lax.scan path — 2.65x, ~27% MFU (from ~10%).

Per-tile schedule:
  loop t = 0..32:   # layer 1, both directions per step
      gates = [x[t]; x[32-t]] @ wi1  +  h1 @ wh1  + b1     (f32 accum)
      h1, c1 = lstm(gates);  save h1 -> h1_seq
  loop t = 0..32:   # layer 2 + fused flatten/dense accumulation
      gates = [h1_seq[t]; h1_seq[32-t]] @ wi2 + h2 @ wh2 + b2
      h2, c2 = lstm(gates)
      acc += h2_f @ wd[t, :160] + h2_b @ wd[32-t, 160:]
  out = selu(acc + bd)

The four heads (128->21/3/33 softmax-after-SELU) stay in XLA: they are
<1% of the FLOPs and fuse into the surrounding program.

Inference-only (no VJP); training uses the lax.scan path in ops/lstm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 256 measured fastest on v5e (64: 958k, 128: 1118k, 256: 1190k trunk
# cand/s at B=8192); 512 exceeds the ~16 MB VMEM budget (x + h1_seq alone)
BATCH_TILE = 256


def _lstm_gates(gates, c, state_dtype):
    # sigmoid written in its tanh form (logistic(x) == 0.5 + 0.5*tanh(x/2),
    # exact in real arithmetic, last-ulp differences in f32): Mosaic's
    # tanh lowering is substantially cheaper than its exp-based logistic,
    # and the VPU gate nonlinearities are ~19% of this kernel's runtime —
    # measured on v5e: 1.63M -> 1.86M trunk cand/s at B=8192 from this
    # rewrite alone (round-5 probe; parity gates in tests/test_pallas_*.py
    # and the bf16-vs-f32 row-parity suites still hold)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = 0.5 + 0.5 * jnp.tanh(0.5 * i)
    f = 0.5 + 0.5 * jnp.tanh(0.5 * f)
    g = jnp.tanh(g)
    o = 0.5 + 0.5 * jnp.tanh(0.5 * o)
    c_new = f * c.astype(jnp.float32) + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new.astype(state_dtype), c_new.astype(state_dtype)


def _trunk_compute(x_ref, wi1_ref, wh1_ref, b1_ref, wi2_ref, wh2_ref, b2_ref,
                   wd_ref, bd_ref,
                   h1_seq, h1_ref, c1_ref, h2_ref, c2_ref, acc_ref):
    """Shared trunk body; returns the post-SELU Dense-D activations (f32)."""
    T = x_ref.shape[0]
    dt = h1_ref.dtype

    h1_ref[:] = jnp.zeros_like(h1_ref)
    c1_ref[:] = jnp.zeros_like(c1_ref)

    wi1 = wi1_ref[:]
    wh1 = wh1_ref[:]
    b1 = b1_ref[:]

    def step1(t, _):
        xf = x_ref[t]              # [bt, C]
        xb = x_ref[T - 1 - t]
        x2 = jnp.stack([xf, xb])   # [2, bt, C]
        gates = (
            jax.lax.dot_general(x2, wi1, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(h1_ref[:], wh1, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
            + b1[:, None, :].astype(jnp.float32)
        )
        h, c = _lstm_gates(gates, c1_ref[:], dt)
        h1_ref[:] = h
        c1_ref[:] = c
        # torch bidirectional layout: feature = [h_fwd(t) ; h_bwd(t)]
        h1_seq[t, :, 0:h.shape[-1]] = h[0]
        h1_seq[T - 1 - t, :, h.shape[-1]:] = h[1]
        return 0

    jax.lax.fori_loop(0, T, step1, 0)

    h2_ref[:] = jnp.zeros_like(h2_ref)
    c2_ref[:] = jnp.zeros_like(c2_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    wi2 = wi2_ref[:]
    wh2 = wh2_ref[:]
    b2 = b2_ref[:]
    H2 = h2_ref.shape[-1]

    def step2(t, _):
        x2 = jnp.stack([h1_seq[t], h1_seq[T - 1 - t]])  # [2, bt, 2H1]
        gates = (
            jax.lax.dot_general(x2, wi2, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(h2_ref[:], wh2, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
            + b2[:, None, :].astype(jnp.float32)
        )
        h, c = _lstm_gates(gates, c2_ref[:], dt)
        h2_ref[:] = h
        c2_ref[:] = c
        # flatten order of reshape(B, T*2H2): row t*2H2+j of wd multiplies
        # h_fwd(t) for j<H2 and h_bwd(t) for j>=H2
        acc_ref[:] += jax.lax.dot_general(
            h[0], wd_ref[t, 0:H2, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            h[1], wd_ref[T - 1 - t, H2:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, T, step2, 0)

    trunk = acc_ref[:] + bd_ref[:].astype(jnp.float32)
    return _selu(trunk)


def _selu(v):
    # selu inlined: jax.nn.selu lowers via expm1, which Mosaic lacks
    scale, alpha = 1.0507009873554805, 1.6732632423543772
    return scale * jnp.where(v > 0, v, alpha * (jnp.exp(v) - 1.0))


def _trunk_kernel(x_ref, wi1_ref, wh1_ref, b1_ref, wi2_ref, wh2_ref, b2_ref,
                  wd_ref, bd_ref, out_ref,
                  h1_seq, h1_ref, c1_ref, h2_ref, c2_ref, acc_ref):
    selu = _trunk_compute(x_ref, wi1_ref, wh1_ref, b1_ref, wi2_ref, wh2_ref,
                          b2_ref, wd_ref, bd_ref,
                          h1_seq, h1_ref, c1_ref, h2_ref, c2_ref, acc_ref)
    out_ref[:] = selu.astype(out_ref.dtype)


def _make_full_kernel(n_heads):
    """Kernel computing trunk + all head branches + softmax in one pass.

    Head math mirrors the XLA branch bit-for-tolerance: the L5 dense and its
    SELU run in the compute dtype, the head logits are cast to the compute
    dtype (like flax Dense(dtype=dt)) then widened to f32 for the
    SELU-before-softmax quirk (reference: clair3/model.py:152-160)."""

    def kernel(*refs):
        (x_ref, wi1_ref, wh1_ref, b1_ref, wi2_ref, wh2_ref, b2_ref,
         wd_ref, bd_ref) = refs[:9]
        head_refs = refs[9:9 + 4 * n_heads]
        out_ref = refs[9 + 4 * n_heads]
        (h1_seq, h1_ref, c1_ref, h2_ref, c2_ref, acc_ref) = refs[10 + 4 * n_heads:]
        trunk = _trunk_compute(x_ref, wi1_ref, wh1_ref, b1_ref, wi2_ref,
                               wh2_ref, b2_ref, wd_ref, bd_ref,
                               h1_seq, h1_ref, c1_ref, h2_ref, c2_ref, acc_ref)
        dt = h1_ref.dtype
        t_dt = trunk.astype(dt)
        probs = []
        for i in range(n_heads):
            w5, b5, wo, bo = head_refs[4 * i: 4 * i + 4]
            h = (jax.lax.dot_general(t_dt, w5[:], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                 + b5[:].astype(jnp.float32))
            h = _selu(h.astype(dt).astype(jnp.float32)).astype(dt)
            logits = (jax.lax.dot_general(h, wo[:], (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                      + bo[:].astype(jnp.float32))
            logits = logits.astype(dt).astype(jnp.float32)
            act = _selu(logits)
            m = jnp.max(act, axis=-1, keepdims=True)
            e = jnp.exp(act - m)
            probs.append(e / jnp.sum(e, axis=-1, keepdims=True))
        out_ref[:] = jnp.concatenate(probs, axis=-1).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("compute_dtype", "batch_tile", "interpret"))
def pileup_trunk_pallas(
    x: jnp.ndarray,     # [B, T, C] any numeric dtype
    wi1: jnp.ndarray,   # [2, C, 4*H1]
    wh1: jnp.ndarray,   # [2, H1, 4*H1]
    b1: jnp.ndarray,    # [2, 4*H1]
    wi2: jnp.ndarray,   # [2, 2*H1, 4*H2]
    wh2: jnp.ndarray,   # [2, H2, 4*H2]
    b2: jnp.ndarray,    # [2, 4*H2]
    wd: jnp.ndarray,    # [T, 2*H2, D]   (reshape of the [T*2*H2, D] dense)
    bd: jnp.ndarray,    # [D]
    compute_dtype=jnp.bfloat16,
    batch_tile: int = BATCH_TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns the post-SELU Dense-D trunk activations ``[B, D]``."""
    B, T, C = x.shape
    H1 = wh1.shape[1]
    H2 = wh2.shape[1]
    D = wd.shape[-1]
    dt = compute_dtype

    bt = min(batch_tile, max(8, B))
    pad = (-B) % bt
    xt = jnp.swapaxes(x.astype(dt), 0, 1)   # [T, B, C]
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad), (0, 0)))
    Bp = B + pad

    args = [xt] + [w.astype(dt) for w in
                   (wi1, wh1, b1, wi2, wh2, b2, wd, bd)]

    out = pl.pallas_call(
        _trunk_kernel,
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec((T, bt, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C, 4 * H1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H1, 4 * H1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * H1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2 * H1, 4 * H2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H2, 4 * H2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * H2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2 * H2, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, D), dt),
        scratch_shapes=[
            pltpu.VMEM((T, bt, 2 * H1), dt),   # h1 sequence
            pltpu.VMEM((2, bt, H1), dt),       # h1 state
            pltpu.VMEM((2, bt, H1), dt),       # c1 state
            pltpu.VMEM((2, bt, H2), dt),       # h2 state
            pltpu.VMEM((2, bt, H2), dt),       # c2 state
            pltpu.VMEM((bt, D), jnp.float32),  # dense accumulator
        ],
        interpret=interpret,
    )(*args)
    return out[:B] if pad else out


@functools.partial(jax.jit,
                   static_argnames=("compute_dtype", "batch_tile", "interpret"))
def pileup_full_pallas(
    x: jnp.ndarray,
    wi1: jnp.ndarray, wh1: jnp.ndarray, b1: jnp.ndarray,
    wi2: jnp.ndarray, wh2: jnp.ndarray, b2: jnp.ndarray,
    wd: jnp.ndarray, bd: jnp.ndarray,
    head_weights,        # flat tuple: (w5, b5, wo, bo) per head
    compute_dtype=jnp.bfloat16,
    batch_tile: int = BATCH_TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """The ENTIRE pileup net in one kernel: trunk + per-head branch dense +
    SELU-before-softmax heads.  Returns probabilities ``[B, sum(head dims)]``
    float32 — what the XLA head stack produced, without the trunk's HBM
    round-trip or the per-head kernel launches."""
    B, T, C = x.shape
    H1 = wh1.shape[1]
    H2 = wh2.shape[1]
    D = wd.shape[-1]
    dt = compute_dtype
    n_heads = len(head_weights) // 4
    out_dim = sum(int(head_weights[4 * i + 3].shape[0]) for i in range(n_heads))

    bt = min(batch_tile, max(8, B))
    pad = (-B) % bt
    xt = jnp.swapaxes(x.astype(dt), 0, 1)
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad), (0, 0)))
    Bp = B + pad

    args = [xt] + [w.astype(dt) for w in
                   (wi1, wh1, b1, wi2, wh2, b2, wd, bd)]
    args += [w.astype(dt) for w in head_weights]

    trunk_specs = [
        pl.BlockSpec((T, bt, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, C, 4 * H1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, H1, 4 * H1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 4 * H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 2 * H1, 4 * H2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, H2, 4 * H2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 4 * H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 2 * H2, D), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    head_specs = [
        pl.BlockSpec(tuple(w.shape),
                     (lambda i: (0, 0)) if w.ndim == 2 else (lambda i: (0,)),
                     memory_space=pltpu.VMEM)
        for w in head_weights
    ]

    out = pl.pallas_call(
        _make_full_kernel(n_heads),
        grid=(Bp // bt,),
        in_specs=trunk_specs + head_specs,
        out_specs=pl.BlockSpec((bt, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, out_dim), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T, bt, 2 * H1), dt),
            pltpu.VMEM((2, bt, H1), dt),
            pltpu.VMEM((2, bt, H1), dt),
            pltpu.VMEM((2, bt, H2), dt),
            pltpu.VMEM((2, bt, H2), dt),
            pltpu.VMEM((bt, D), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out[:B] if pad else out
