import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clair3_tpu.models import FullAlignmentNet, PileupNet
from clair3_tpu.parallel.mesh import batch_sharding, get_mesh
from clair3_tpu.train.loss import focal_loss, multitask_loss
from clair3_tpu.train.step import create_train_state, make_train_step, shard_train_state


def test_focal_loss_values():
    y_true = jnp.array([[0.0, 1.0, 0.0]])
    # perfect prediction -> ~0 loss
    near_one = jnp.array([[0.0, 1.0, 0.0]])
    assert float(focal_loss(y_true, near_one)[0]) < 1e-6
    # uniform prediction -> positive loss
    uniform = jnp.array([[1 / 3, 1 / 3, 1 / 3]])
    expected = -((1 - 1 / 3) ** 2) * np.log(1 / 3)
    assert float(focal_loss(y_true, uniform)[0]) == pytest.approx(expected, rel=1e-5)


def test_multitask_loss_shapes():
    preds = jnp.full((4, 90), 1.0 / 21)
    labels = np.zeros((4, 90), np.float32)
    labels[:, 3] = 1
    labels[:, 22] = 1
    labels[:, 40] = 1
    labels[:, 73] = 1
    loss = multitask_loss(preds, jnp.asarray(labels), add_indel_length=True)
    assert np.isfinite(float(loss)) and float(loss) > 0


def _one_hot_labels(B):
    y = np.zeros((B, 90), np.float32)
    y[:, 0] = 1
    y[:, 21] = 1
    y[:, 24 + 16] = 1
    y[:, 57 + 16] = 1
    return y


def test_pileup_train_step_reduces_loss():
    model = PileupNet(add_indel_length=False)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).integers(-20, 20, (32, 33, 18)), jnp.int32)
    y = jnp.asarray(_one_hot_labels(32))
    state, tx = create_train_state(model, rng, x[:2], learning_rate=1e-3)
    step = make_train_step(model, tx, add_indel_length=False, has_batch_stats=False)
    losses = []
    for i in range(5):
        state, loss = step(state, x, y, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_fa_train_step_sharded_over_mesh():
    mesh = get_mesh()
    assert mesh.devices.size == 8  # virtual CPU mesh from conftest
    model = FullAlignmentNet(add_indel_length=True)
    rng = jax.random.PRNGKey(0)
    B = 16
    x_np = np.random.default_rng(0).integers(-100, 100, (B, 55, 33, 8)).astype(np.int8)
    y_np = _one_hot_labels(B)
    state, tx = create_train_state(model, rng, jnp.asarray(x_np[:2]))
    state = shard_train_state(state, mesh)
    step = make_train_step(model, tx, add_indel_length=True,
                           has_batch_stats=True, mesh=mesh)
    data = batch_sharding(mesh)
    x = jax.device_put(x_np, data)
    y = jax.device_put(y_np, data)
    state2, loss1 = step(state, x, y, jax.random.PRNGKey(1))
    state3, loss2 = step(state2, x, y, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)
    assert int(state3.step) == 2


def test_graft_entry_contract():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    y = jax.jit(fn)(*args)
    assert y.shape == (256, 90)
    ge.dryrun_multichip(8)


def test_trainer_with_mesh_pads_batches(tmp_path):
    """train_model over the 8-device mesh: odd batch sizes must pad cleanly."""
    import numpy as np
    from clair3_tpu.config import TrainConfig
    from clair3_tpu.parallel.mesh import get_mesh
    from clair3_tpu.train.data import write_bin
    from clair3_tpu.train.trainer import train_model

    rng = np.random.default_rng(0)
    n = 173  # deliberately not divisible by 8
    x = rng.integers(-20, 20, (n, 33, 18)).astype(np.int32)
    y = np.zeros((n, 90), np.float32)
    y[:, 0] = y[:, 21] = y[:, 24 + 16] = y[:, 57 + 16] = 1
    bin_path = str(tmp_path / "t.bin")
    write_bin(bin_path, x, y, [f"chr1:{i}:A" for i in range(n)], ["1-"] * n)

    cfg = TrainConfig(pileup=True, add_indel_length=False, batch_size=50,
                      chunk_size_pileup=25, max_epoch=1)
    result = train_model([bin_path], str(tmp_path / "m"), cfg,
                         mesh=get_mesh(), max_steps=4)
    assert np.isfinite(result["best_val_loss"])
