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
    """Bidirectional LSTM over ``[B, T, C]``, output ``[B, T, 2H]``."""

    hidden: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fwd = LSTMDirection(self.hidden, reverse=False, param_dtype=self.param_dtype, name="fwd")(x)
        bwd = LSTMDirection(self.hidden, reverse=True, param_dtype=self.param_dtype, name="bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)
