"""FA conv1 banded-matmul Pallas kernel vs the flax ConvBNRelu (interpret
mode on CPU).  The kernel does NOT ship as the default: the round-5
on-chip measurement (scripts/bench_fa_conv1.py) found it ~3x slower than
XLA's own conv1 (which is 14% of net time, not the 38% a round-4
dead-code-prone profile claimed); the FA net is ~64% MFU under plain XLA.
It compiles and is numerically exact on the real chip for all four
55/89 x 8/9 geometries, and remains available behind
CLAIR3T_ENABLE_FA_CONV1=1 (cli._use_pallas_fa_conv1) as a documented
negative result.

The contract: FullAlignmentNet(use_pallas_conv1=True) must (a) declare the
exact same parameter/batch-stats tree as the ConvBNRelu path so any
checkpoint drives either, and (b) produce the same probabilities.  The
kernel itself must equal conv+BN+ReLU exactly (it is a reformulation, not
an approximation — comparisons run under matmul precision 'highest'
because both XLA's CPU conv and the interpreter's dot default to
bf16-accumulation passes otherwise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clair3_tpu.models import FullAlignmentNet
from clair3_tpu.models.full_alignment import ConvBNRelu
from clair3_tpu.ops.pallas_fa import fa_conv1_pallas


@pytest.mark.parametrize("d,w,c", [(89, 33, 8), (55, 33, 9), (56, 34, 8)])
def test_kernel_matches_conv_bn_relu(d, w, c):
    """Exact (1e-5) match vs conv+BN+ReLU across the platform geometries:
    ONT 89x33x8, dwell 55x33x9, and even spatial dims."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randint(-100, 101, (12, d, w, c)), jnp.int8)
    k = jnp.asarray(rs.randn(3, 3, c, 64) * 0.2, jnp.float32)
    b = jnp.asarray(rs.randn(64) * 0.1, jnp.float32)
    g = jnp.asarray(rs.rand(64) + 0.5, jnp.float32)
    be = jnp.asarray(rs.randn(64) * 0.1, jnp.float32)
    mean = jnp.asarray(rs.randn(64) * 0.3, jnp.float32)
    var = jnp.asarray(rs.rand(64) + 0.5, jnp.float32)
    variables = {"params": {"conv": {"kernel": k, "bias": b},
                            "bn": {"scale": g, "bias": be}},
                 "batch_stats": {"bn": {"mean": mean, "var": var}}}
    with jax.default_matmul_precision("highest"):
        ref = ConvBNRelu(64, strides=2).apply(
            variables, x.astype(jnp.float32) / 100.0, train=False)
        got = fa_conv1_pallas(x, k, b, g, be, mean, var,
                              compute_dtype=jnp.float32, interpret=True)
    assert ref.shape == got.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_kernel_batch_padding():
    """B not a multiple of the tile pads internally and truncates back."""
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randint(-50, 51, (11, 89, 33, 8)), jnp.int8)
    out = fa_conv1_pallas(
        x, jnp.asarray(rs.randn(3, 3, 8, 64) * 0.1, jnp.float32),
        jnp.zeros(64), jnp.ones(64), jnp.zeros(64), jnp.zeros(64),
        jnp.ones(64), compute_dtype=jnp.float32, batch_tile=8,
        interpret=True)
    assert out.shape == (11, 45, 17, 64)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("in_ch", [8, 9])
def test_fused_model_matches_standard(in_ch):
    rs = np.random.RandomState(2)
    x = rs.randint(-100, 101, (6, 89, 33, in_ch)).astype(np.int8)
    std = FullAlignmentNet(add_indel_length=True, input_channels=in_ch)
    v = std.init(jax.random.PRNGKey(0), jnp.zeros((2, 89, 33, in_ch),
                                                  jnp.int8))
    fused = FullAlignmentNet(add_indel_length=True, input_channels=in_ch,
                             use_pallas_conv1=True)
    v2 = fused.init(jax.random.PRNGKey(0), jnp.zeros((2, 89, 33, in_ch),
                                                     jnp.int8))
    # identical parameter trees: checkpoints are interchangeable
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    for (p1, a), (p2, b) in zip(jax.tree_util.tree_leaves_with_path(v),
                                jax.tree_util.tree_leaves_with_path(v2)):
        assert p1 == p2 and a.shape == b.shape and a.dtype == b.dtype

    with jax.default_matmul_precision("highest"):
        y_std = np.asarray(std.apply(v, x, train=False))
        y_fused = np.asarray(fused.apply(v, x, train=False))
    np.testing.assert_allclose(y_fused, y_std, atol=2e-4)

    # bf16 compute stays within softmax tolerance of f32
    fused16 = FullAlignmentNet(add_indel_length=True, input_channels=in_ch,
                               use_pallas_conv1=True,
                               compute_dtype=jnp.bfloat16)
    y16 = np.asarray(fused16.apply(v, x, train=False))
    assert np.max(np.abs(y16 - y_std)) < 2e-2


def test_fused_model_train_step_uses_conv_path():
    """train=True must take the differentiable ConvBNRelu branch (the
    kernel has no VJP) and update batch stats like the standard module."""
    model = FullAlignmentNet(add_indel_length=True, use_pallas_conv1=True)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 89, 33, 8),
                                                    jnp.int8))
    x = jnp.asarray(np.random.RandomState(3).randint(
        -50, 51, (4, 89, 33, 8)), jnp.int8)

    def loss(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return jnp.sum(out ** 2), updates

    (val, updates), grads = jax.value_and_grad(loss, has_aux=True)(
        v["params"])
    assert np.isfinite(float(val))
    g1 = grads["conv1"]["conv"]["kernel"]
    assert float(jnp.max(jnp.abs(g1))) > 0
    assert not np.allclose(
        np.asarray(updates["batch_stats"]["conv1"]["bn"]["mean"]),
        np.asarray(v["batch_stats"]["conv1"]["bn"]["mean"]))


def test_cli_loader_wires_kernel_per_guard(tmp_path, monkeypatch):
    """cli._load_engine must build FullAlignmentNet with use_pallas_conv1
    exactly per the guard: DEFAULT OFF (the kernel measured slower than
    XLA), opt-in via CLAIR3T_ENABLE_FA_CONV1=1 on TPU+bf16 only."""
    from clair3_tpu.cli import _load_engine, _use_pallas_fa_conv1
    from clair3_tpu.models.params_io import save_variables

    # guard truth table (backend faked; the real-TPU compile is covered by
    # scripts/bench_fa_conv1.py)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("CLAIR3T_ENABLE_FA_CONV1", raising=False)
    assert _use_pallas_fa_conv1(jnp.bfloat16) is False  # default: off
    monkeypatch.setenv("CLAIR3T_ENABLE_FA_CONV1", "1")
    assert _use_pallas_fa_conv1(jnp.bfloat16) is True
    assert _use_pallas_fa_conv1(jnp.float32) is False
    monkeypatch.setenv("CLAIR3T_DISABLE_PALLAS", "1")
    assert _use_pallas_fa_conv1(jnp.bfloat16) is False  # kill-switch wins
    monkeypatch.delenv("CLAIR3T_DISABLE_PALLAS")
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert _use_pallas_fa_conv1(jnp.bfloat16) is False  # TPU only

    # loader passes the flag through to the model
    net = FullAlignmentNet(add_indel_length=True)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 55, 33, 8), jnp.int8),
                 train=False)
    path = str(tmp_path / "fa.npz")
    save_variables(path, v)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    eng = _load_engine(path, "full_alignment", "hifi",
                       compute_dtype="bf16")
    assert eng.model.use_pallas_conv1 is True  # env still set from above
    monkeypatch.delenv("CLAIR3T_ENABLE_FA_CONV1")
    eng_def = _load_engine(path, "full_alignment", "hifi",
                           compute_dtype="bf16")
    assert eng_def.model.use_pallas_conv1 is False
