"""MXU-friendly bidirectional LSTM.

The reference pileup network (clair3/model.py:96-107) stacks two
``nn.LSTM(batch_first=True, bidirectional=True)`` layers over a 33-step
window.  On TPU the hot design point is:

* the input projection for *all* timesteps is one large matmul
  ``[B*T, C] @ [C, 4H]`` that tiles cleanly onto the MXU, and
* only the small recurrent matmul ``[B, H] @ [H, 4H]`` lives inside a
  ``jax.lax.scan`` over the (short, static) time axis.

Parameter layout per direction: ``wi: [C, 4H]``, ``wh: [H, 4H]``,
``b: [4H]`` with torch gate order (input, forget, cell, output); torch's two
bias vectors fold into one (see clair3_tpu/models/convert.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _lstm_scan(xw: jnp.ndarray, wh: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """Run the recurrence given pre-projected inputs ``xw: [B, T, 4H]``.

    Returns hidden states ``[B, T, H]`` in original time order.
    """
    B, T, H4 = xw.shape
    H = H4 // 4
    dtype = xw.dtype

    xw_t = jnp.swapaxes(xw, 0, 1)  # [T, B, 4H]

    def step(carry, x_t):
        h, c = carry
        gates = x_t + h @ wh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((B, H), dtype=dtype),
        jnp.zeros((B, H), dtype=dtype),
    )
    _, hs = jax.lax.scan(step, init, xw_t, reverse=reverse)
    # scan(reverse=True) feeds inputs back-to-front but stacks outputs in
    # input order, which is exactly torch's bidirectional convention.
    return jnp.swapaxes(hs, 0, 1)  # [B, T, H]


def _bilstm_fused_scan(
    xw_f: jnp.ndarray, xw_b: jnp.ndarray,
    wh_f: jnp.ndarray, wh_b: jnp.ndarray,
) -> jnp.ndarray:
    """Both directions in ONE scan: step t consumes time t forward and time
    T-1-t backward, with the two recurrent matmuls batched into a single
    [2, B, H] x [2, H, 4H] contraction.  Halves the sequential-step count
    versus two independent scans (XLA runs separate scans back to back).

    Returns the concatenated hidden states [B, T, 2H] in torch order.
    """
    B, T, H4 = xw_f.shape
    H = H4 // 4
    dtype = xw_f.dtype

    # [T, 2, B, 4H]: slot 0 walks forward, slot 1 walks backward
    xw = jnp.stack([jnp.swapaxes(xw_f, 0, 1),
                    jnp.swapaxes(xw_b, 0, 1)[::-1]], axis=1)
    wh = jnp.stack([wh_f, wh_b])  # [2, H, 4H]

    def step(carry, x_t):
        h, c = carry  # [2, B, H]
        gates = x_t + jnp.einsum(
            "dbh,dhg->dbg", h, wh,
            preferred_element_type=dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((2, B, H), dtype=dtype),
        jnp.zeros((2, B, H), dtype=dtype),
    )
    _, hs = jax.lax.scan(step, init, xw)  # [T, 2, B, H]
    fwd = jnp.swapaxes(hs[:, 0], 0, 1)        # [B, T, H]
    bwd = jnp.swapaxes(hs[::-1, 1], 0, 1)     # un-reverse the backward pass
    return jnp.concatenate([fwd, bwd], axis=-1)


class LSTMDirection(nn.Module):
    hidden: int
    reverse: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        H = self.hidden
        wi = self.param("wi", nn.initializers.lecun_normal(), (C, 4 * H), self.param_dtype)
        wh = self.param("wh", nn.initializers.orthogonal(), (H, 4 * H), self.param_dtype)
        b = self.param("b", nn.initializers.zeros, (4 * H,), self.param_dtype)
        dtype = x.dtype
        xw = x @ wi.astype(dtype) + b.astype(dtype)  # one big MXU matmul
        return _lstm_scan(xw, wh.astype(dtype), self.reverse)


class BiLSTM(nn.Module):
    """Bidirectional LSTM over ``[B, T, C]``, output ``[B, T, 2H]``.

    Parameters live under ``fwd``/``bwd`` (torch-checkpoint-compatible); the
    forward pass fuses both directions into one scan with batched recurrent
    matmuls (``fused=False`` falls back to two independent scans)."""

    hidden: int
    param_dtype: Any = jnp.float32
    fused: bool = True
    # Run the recurrence as a Pallas TPU kernel (h/c resident in VMEM for the
    # whole sequence).  Inference-only: the kernel defines no VJP.
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.fused:
            fwd = LSTMDirection(self.hidden, reverse=False, param_dtype=self.param_dtype, name="fwd")(x)
            bwd = LSTMDirection(self.hidden, reverse=True, param_dtype=self.param_dtype, name="bwd")(x)
            return jnp.concatenate([fwd, bwd], axis=-1)

        C = x.shape[-1]
        H = self.hidden
        init_wi = nn.initializers.lecun_normal()
        init_wh = nn.initializers.orthogonal()
        scope_f = self.scope.push("fwd")  # keep the fwd/bwd param layout
        wi_f = scope_f.param("wi", init_wi, (C, 4 * H), self.param_dtype)
        wh_f = scope_f.param("wh", init_wh, (H, 4 * H), self.param_dtype)
        b_f = scope_f.param("b", nn.initializers.zeros, (4 * H,), self.param_dtype)
        scope_b = self.scope.push("bwd")
        wi_b = scope_b.param("wi", init_wi, (C, 4 * H), self.param_dtype)
        wh_b = scope_b.param("wh", init_wh, (H, 4 * H), self.param_dtype)
        b_b = scope_b.param("b", nn.initializers.zeros, (4 * H,), self.param_dtype)

        dtype = x.dtype
        # one big MXU matmul for both directions' input projections
        wi = jnp.concatenate([wi_f, wi_b], axis=1).astype(dtype)  # [C, 8H]
        xw = x @ wi
        xw_f = xw[..., : 4 * H] + b_f.astype(dtype)
        xw_b = xw[..., 4 * H:] + b_b.astype(dtype)
        if self.use_pallas:
            from clair3_tpu.ops.pallas_lstm import bilstm_pallas

            stacked = jnp.stack([jnp.swapaxes(xw_f, 0, 1),
                                 jnp.swapaxes(xw_b, 0, 1)[::-1]], axis=1)
            wh = jnp.stack([wh_f, wh_b]).astype(dtype)
            hs = bilstm_pallas(stacked, wh)
            fwd = jnp.swapaxes(hs[:, 0], 0, 1)
            bwd = jnp.swapaxes(hs[::-1, 1], 0, 1)
            return jnp.concatenate([fwd, bwd], axis=-1)
        return _bilstm_fused_scan(xw_f, xw_b, wh_f.astype(dtype), wh_b.astype(dtype))
