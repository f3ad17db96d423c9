"""Pallas TPU kernel: fused bidirectional LSTM recurrence.

The BiLSTM's 33-step recurrence is latency-bound under ``lax.scan``: each
step's hidden/cell state round-trips HBM and pays while-loop overhead.  This
kernel keeps h/c (and the batch tile's pre-projected inputs) resident in
VMEM for the whole sequence: grid over batch tiles, ``fori_loop`` over time,
both directions advanced per step with one batched MXU contraction.

Layout (matching ops/lstm.py's fused scan):
    xw  [T, 2, B, 4H]   pre-projected inputs; slot 1 pre-reversed in time
    wh  [2, H, 4H]      recurrent weights per direction
    out [T, 2, B, H]    hidden states (slot 1 still time-reversed)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BATCH_TILE = 64  # 2x-buffered xw block must fit 16MB VMEM


def _kernel(xw_ref, wh_ref, out_ref, h_ref, c_ref):
    T = xw_ref.shape[0]
    wh = wh_ref[:]

    h_ref[:] = jnp.zeros_like(h_ref)
    c_ref[:] = jnp.zeros_like(c_ref)

    def step(t, _):
        x_t = xw_ref[t]  # [2, Bt, 4H]
        h = h_ref[:]
        c = c_ref[:]
        # Mosaic requires 32-bit matmul accumulation
        gates = x_t.astype(jnp.float32) + jax.lax.dot_general(
            h, wh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = (f * c.astype(jnp.float32) + i * g).astype(c_ref.dtype)
        h = (o * jnp.tanh(c.astype(jnp.float32))).astype(h_ref.dtype)
        h_ref[:] = h
        c_ref[:] = c
        out_ref[t] = h.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, T, step, 0)


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def bilstm_pallas(
    xw: jnp.ndarray,   # [T, 2, B, 4H]
    wh: jnp.ndarray,   # [2, H, 4H]
    batch_tile: int = DEFAULT_BATCH_TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    T, two, B, H4 = xw.shape
    H = H4 // 4
    bt = min(batch_tile, B)
    pad = (-B) % bt
    if pad:
        xw = jnp.pad(xw, ((0, 0), (0, 0), (0, pad), (0, 0)))
    Bp = B + pad

    out = pl.pallas_call(
        _kernel,
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec((T, 2, bt, H4), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, H4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, 2, bt, H), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 2, Bp, H), xw.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bt, H), xw.dtype),
            pltpu.VMEM((2, bt, H), xw.dtype),
        ],
        interpret=interpret,
    )(xw, wh.astype(xw.dtype))
    return out[:, :, :B] if pad else out
