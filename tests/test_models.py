import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clair3_tpu.models import FullAlignmentNet, PileupNet


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_pileup_net_shapes(rng):
    model = PileupNet(add_indel_length=False)
    x = jnp.zeros((4, 33, 18), jnp.int32)
    variables = model.init(rng, x)
    y = model.apply(variables, x)
    assert y.shape == (4, 24)
    np.testing.assert_allclose(np.sum(y[:, :21], axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.sum(y[:, 21:24], axis=-1), 1.0, rtol=1e-5)


def test_pileup_net_indel_heads(rng):
    model = PileupNet(add_indel_length=True)
    x = jnp.zeros((2, 33, 18), jnp.int32)
    variables = model.init(rng, x)
    y = model.apply(variables, x)
    assert y.shape == (2, 90)
    np.testing.assert_allclose(np.sum(y[:, 24:57], axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.sum(y[:, 57:90], axis=-1), 1.0, rtol=1e-5)


def test_pileup_net_jit(rng):
    model = PileupNet()
    x = jnp.ones((8, 33, 18), jnp.int32)
    variables = model.init(rng, x)
    fn = jax.jit(lambda v, x: model.apply(v, x))
    y1 = fn(variables, x)
    y2 = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


@pytest.mark.parametrize("depth", [89, 55])
def test_full_alignment_net_shapes(rng, depth):
    model = FullAlignmentNet(add_indel_length=True)
    x = jnp.zeros((2, depth, 33, 8), jnp.int8)
    variables = model.init(rng, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 90)
    for s, e in ((0, 21), (21, 24), (24, 57), (57, 90)):
        np.testing.assert_allclose(np.sum(y[:, s:e], axis=-1), 1.0, rtol=1e-5)


def test_full_alignment_net_dwell_channel(rng):
    model = FullAlignmentNet(add_indel_length=True, input_channels=9)
    x = jnp.zeros((2, 89, 33, 9), jnp.int8)
    variables = model.init(rng, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 90)


def test_full_alignment_train_mode_mutates_batch_stats(rng):
    model = FullAlignmentNet(add_indel_length=True)
    x = jnp.asarray(
        np.random.default_rng(0).integers(-100, 100, size=(4, 55, 33, 8)), jnp.int8
    )
    variables = model.init(rng, x, train=False)
    y, mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert y.shape == (4, 90)
    assert "batch_stats" in mutated


def test_fb_binary_net(rng):
    from clair3_tpu.models import FullAlignmentBinaryNet

    model = FullAlignmentBinaryNet()
    x = jnp.zeros((2, 89, 33, 8), jnp.int8)
    variables = model.init(rng, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 1)
    assert ((np.asarray(y) > 0) & (np.asarray(y) < 1)).all()
