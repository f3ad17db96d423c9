"""Sharded-vs-single-device output parity (VERDICT r02 #4).

The reference's implicit guarantee is that DDP all-reduce equals
single-GPU math; the mesh-sharded equivalent here must be explicit: the
same candidate tensors through a 1-device and an 8-device InferenceEngine
produce the same probabilities and byte-identical decoded VCF rows, and
the same training batch produces matching losses and parameter updates.
Runs on the virtual 8-CPU-device mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np

from clair3_tpu.decode import DecodeConfig, batch_decode
from clair3_tpu.models import FullAlignmentNet, PileupNet
from clair3_tpu.parallel.mesh import batch_sharding, get_mesh, shard_batch
from clair3_tpu.pipeline.engine import InferenceEngine
from clair3_tpu.train.step import (create_train_state, make_train_step,
                                   shard_train_state)


def _engines(model, variables, buckets):
    e1 = InferenceEngine(model, variables, mesh=get_mesh(n_devices=1),
                         buckets=buckets)
    e8 = InferenceEngine(model, variables, mesh=get_mesh(), buckets=buckets)
    assert e8.mesh.devices.size == 8
    return e1, e8


def test_pileup_inference_parity_1_vs_8_devices():
    model = PileupNet(add_indel_length=False)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 33, 18), jnp.int32))
    e1, e8 = _engines(model, v, buckets=(64,))
    rng = np.random.default_rng(1)
    x = rng.integers(-30, 30, (50, 33, 18)).astype(np.int32)  # pads to 64
    p1 = e1.predict(x)
    p8 = e8.predict(x)
    np.testing.assert_allclose(p8, p1, atol=1e-6, rtol=1e-6)

    # byte-identical decoded rows
    pos_infos = [f"chr1:{1000 + 40 * i}:{'ACGTA' * 6}ACG" for i in range(50)]
    alt_infos = ["30-XC 14 RA 16 " for _ in range(50)]
    cfg = DecodeConfig(add_indel_length=False, pileup=True, show_ref_calls=True)
    rows1 = batch_decode(pos_infos, alt_infos, p1, cfg)
    rows8 = batch_decode(pos_infos, alt_infos, p8, cfg)
    assert rows1 == rows8


def test_fa_inference_parity_1_vs_8_devices():
    model = FullAlignmentNet(add_indel_length=True)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 55, 33, 8), jnp.int8),
                   train=False)
    e1, e8 = _engines(model, v, buckets=(32,))
    rng = np.random.default_rng(2)
    x = rng.integers(-100, 100, (23, 55, 33, 8)).astype(np.int8)
    p1 = e1.predict(x)
    p8 = e8.predict(x)
    np.testing.assert_allclose(p8, p1, atol=1e-6, rtol=1e-6)


def test_train_step_parity_1_vs_8_devices():
    """Same batch, same init: per-step losses and resulting parameters must
    agree between a 1-device and an 8-device mesh (the psum over 8 shards
    reassociates float adds, hence tolerance rather than bitwise)."""
    model = PileupNet(add_indel_length=False)
    rng = jax.random.PRNGKey(0)
    B = 32
    g = np.random.default_rng(0)
    x_np = g.integers(-20, 20, (B, 33, 18)).astype(np.int32)
    y_np = np.zeros((B, 90), np.float32)
    y_np[:, 0] = y_np[:, 21] = y_np[:, 24 + 16] = y_np[:, 57 + 16] = 1

    results = {}
    for n_dev in (1, 8):
        mesh = get_mesh(n_devices=n_dev)
        state, tx = create_train_state(model, rng, jnp.asarray(x_np[:2]),
                                       learning_rate=1e-3)
        state = shard_train_state(state, mesh)
        step = make_train_step(model, tx, add_indel_length=False,
                               has_batch_stats=False, mesh=mesh)
        x = shard_batch(mesh, x_np)
        y = shard_batch(mesh, y_np)
        losses = []
        for i in range(3):
            state, loss = step(state, x, y, jax.random.PRNGKey(7))
            losses.append(float(loss))
        results[n_dev] = (losses, jax.device_get(state.params))

    l1, p1 = results[1]
    l8, p8 = results[8]
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(p8))
    # dict() over paths keeps pairing explicit
    flat8 = {k: v for k, v in flat8.items()} if isinstance(flat8, dict) else flat8
    for path, a in flat1:
        b = flat8[path]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-4,
            err_msg=f"parameter diverged at {path}")


def test_depth_crop_engine_bit_exact():
    """depth_crop ships the centered depth band and zero-pads back inside
    jit: predictions must be IDENTICAL to the uncropped engine, including
    the fallback for bands too wide to crop."""
    model = FullAlignmentNet(add_indel_length=True)
    v = model.init(jax.random.PRNGKey(3), jnp.zeros((2, 89, 33, 8), jnp.int8),
                   train=False)
    rng = np.random.default_rng(5)
    # 30x-like: ~30 reads centered in the 89-deep matrix
    x = np.zeros((12, 89, 33, 8), np.int8)
    for i in range(12):
        d = int(rng.integers(18, 34))
        top = (89 - d) // 2
        x[i, top: top + d] = rng.integers(-100, 100, (d, 33, 8))
    # one candidate at full depth (crop must fall back, not corrupt)
    x[0] = rng.integers(-100, 100, (89, 33, 8))

    plain = InferenceEngine(model, v, mesh=get_mesh(n_devices=1), buckets=(16,))
    cropped = InferenceEngine(model, v, mesh=get_mesh(n_devices=1),
                              buckets=(16,), depth_crop=True)
    p_plain = plain.predict(x)
    p_crop = cropped.predict(x)
    np.testing.assert_array_equal(p_crop, p_plain)

    # and the cropping really engages for a shallow batch
    shallow = x[1:]
    c2, full = cropped._crop_depth(shallow)
    assert full == 89 and c2.shape[1] < 89
    np.testing.assert_array_equal(cropped.predict(shallow),
                                  plain.predict(shallow))
