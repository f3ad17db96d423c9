"""Pallas fused-LSTM kernel vs the lax.scan implementation (interpret mode;
the TPU path is exercised by bench.py / manual runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clair3_tpu.ops.lstm import _bilstm_fused_scan
from clair3_tpu.ops.pallas_lstm import bilstm_pallas


@pytest.mark.parametrize("B,H", [(8, 128), (12, 128)])
def test_pallas_matches_scan(B, H):
    T = 33
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    xw_f = jax.random.normal(k1, (B, T, 4 * H), jnp.float32)
    xw_b = jax.random.normal(k2, (B, T, 4 * H), jnp.float32)
    wh_f = jax.random.normal(k3, (H, 4 * H), jnp.float32) * 0.1
    wh_b = jax.random.normal(k4, (H, 4 * H), jnp.float32) * 0.1

    expected = _bilstm_fused_scan(xw_f, xw_b, wh_f, wh_b)  # [B, T, 2H]

    xw = jnp.stack([jnp.swapaxes(xw_f, 0, 1),
                    jnp.swapaxes(xw_b, 0, 1)[::-1]], axis=1)
    wh = jnp.stack([wh_f, wh_b])
    hs = bilstm_pallas(xw, wh, batch_tile=8, interpret=True)  # [T, 2, B, H]
    fwd = jnp.swapaxes(hs[:, 0], 0, 1)
    bwd = jnp.swapaxes(hs[::-1, 1], 0, 1)
    got = jnp.concatenate([fwd, bwd], axis=-1)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)


def test_pallas_batch_padding():
    T, B, H = 33, 5, 128  # B not a multiple of the tile
    key = jax.random.PRNGKey(1)
    xw = jax.random.normal(key, (T, 2, B, 4 * H), jnp.float32)
    wh = jax.random.normal(key, (2, H, 4 * H), jnp.float32) * 0.1
    hs = bilstm_pallas(xw, wh, batch_tile=4, interpret=True)
    assert hs.shape == (T, 2, B, H)
