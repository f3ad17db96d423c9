"""Fused full-trunk Pallas kernel vs the lax.scan pileup net (interpret
mode on CPU; the compiled TPU path is exercised by bench.py).

The contract: PileupNet(use_pallas_lstm=True) must (a) declare the exact
same parameter tree as the scan path so any checkpoint drives either, and
(b) produce the same probabilities to within bf16-accumulation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clair3_tpu.models import PileupNet
from clair3_tpu.ops.pallas_pileup import pileup_trunk_pallas


@pytest.mark.parametrize("add_indel_length", [False, True])
def test_fused_trunk_matches_scan_model(add_indel_length):
    x = np.random.RandomState(0).randint(-30, 30, (12, 33, 18)).astype(np.int32)
    std = PileupNet(add_indel_length=add_indel_length)
    v = std.init(jax.random.PRNGKey(0), jnp.zeros((8, 33, 18), jnp.int32))
    y_std = np.asarray(std.apply(v, x, train=False))

    fused = PileupNet(add_indel_length=add_indel_length, use_pallas_lstm=True)
    v2 = fused.init(jax.random.PRNGKey(0), jnp.zeros((8, 33, 18), jnp.int32))
    # identical parameter trees: checkpoints are interchangeable
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    for (p1, a), (p2, b) in zip(jax.tree_util.tree_leaves_with_path(v),
                                jax.tree_util.tree_leaves_with_path(v2)):
        assert p1 == p2 and a.shape == b.shape and a.dtype == b.dtype

    y_fused = np.asarray(fused.apply(v, x, train=False))
    np.testing.assert_allclose(y_fused, y_std, atol=2e-4)

    # bf16 compute stays within softmax tolerance of f32
    fused16 = PileupNet(add_indel_length=add_indel_length,
                        use_pallas_lstm=True, compute_dtype=jnp.bfloat16)
    y16 = np.asarray(fused16.apply(v, x, train=False))
    assert np.max(np.abs(y16 - y_std)) < 1e-2


def test_fused_trunk_batch_padding():
    """B not a multiple of the tile pads internally and truncates back."""
    T, C, H1, H2, D = 33, 18, 16, 24, 16
    r = np.random.RandomState(1)
    f = lambda *s: jnp.asarray(r.randn(*s) * 0.1, jnp.float32)  # noqa: E731
    out = pileup_trunk_pallas(
        f(11, T, C), f(2, C, 4 * H1), f(2, H1, 4 * H1), f(2, 4 * H1),
        f(2, 2 * H1, 4 * H2), f(2, H2, 4 * H2), f(2, 4 * H2),
        f(T, 2 * H2, D), f(D), compute_dtype=jnp.float32,
        batch_tile=8, interpret=True)
    assert out.shape == (11, D)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fused_trunk_flatten_order():
    """The dense accumulation must follow reshape(B, T*2H) row order:
    zeroing all wd rows except time t's forward block isolates h_fwd(t)."""
    T, C, H1, H2, D = 5, 4, 8, 8, 8
    r = np.random.RandomState(2)
    f = lambda *s: jnp.asarray(r.randn(*s) * 0.3, jnp.float32)  # noqa: E731
    x = f(8, T, C)
    args = (f(2, C, 4 * H1), f(2, H1, 4 * H1), f(2, 4 * H1),
            f(2, 2 * H1, 4 * H2), f(2, H2, 4 * H2), f(2, 4 * H2))
    from clair3_tpu.ops.lstm import _bilstm_fused_scan

    def reference_h2(x):
        wi1, wh1, b1, wi2, wh2, b2 = args
        xw = x @ wi1[0], x @ wi1[1]
        h1 = _bilstm_fused_scan(xw[0] + b1[0], xw[1] + b1[1], wh1[0], wh1[1])
        xw2 = h1 @ wi2[0], h1 @ wi2[1]
        return _bilstm_fused_scan(xw2[0] + b2[0], xw2[1] + b2[1], wh2[0], wh2[1])

    h2 = np.asarray(reference_h2(x))  # [B, T, 2H2]
    for t, half in ((1, 0), (3, 1)):
        wd = np.zeros((T, 2 * H2, D), np.float32)
        block = r.randn(H2, D).astype(np.float32)
        wd[t, half * H2:(half + 1) * H2] = block
        out = pileup_trunk_pallas(
            x, *args, jnp.asarray(wd), jnp.zeros((D,), jnp.float32),
            compute_dtype=jnp.float32, batch_tile=8, interpret=True)
        want = h2[:, t, half * H2:(half + 1) * H2] @ block
        scale, alpha = 1.0507009873554805, 1.6732632423543772
        want = scale * np.where(want > 0, want, alpha * np.expm1(want))
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)
