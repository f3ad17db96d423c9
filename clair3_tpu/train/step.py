"""Sharded training step.

Replaces the reference's torchrun + DistributedDataParallel over NCCL
(Train.py:28-68) with a jit-compiled step over a ``jax.sharding.Mesh``:
parameters/optimizer state replicated, batch sharded along the data axis,
XLA inserting the gradient all-reduce.  AdamW (lr 1e-3, weight decay 1e-4
pileup / 1e-7 FA) matches the reference optimizer settings (Train.py:386-388).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from clair3_tpu.parallel.mesh import batch_sharding, replicated_sharding
from clair3_tpu.train.loss import multitask_loss


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any           # None for models without BatchNorm
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    model,
    rng,
    example_input,
    learning_rate: float = 1e-3,
    weight_decay: float = 1e-4,
) -> Tuple[TrainState, optax.GradientTransformation]:
    variables = model.init(rng, example_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    opt_state = tx.init(params)
    return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32)), tx


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    add_indel_length: bool,
    has_batch_stats: bool,
    mesh=None,
    gamma: float = 2.0,
    task_class_weights=None,
) -> Callable:
    """Build the jitted sharded train step: (state, batch_x, batch_y, rng) ->
    (state, loss).  When a mesh is given, inputs are expected sharded along
    the data axis and state replicated; XLA reduces the gradients."""

    def loss_fn(params, batch_stats, x, y, dropout_rng):
        variables = {"params": params}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
            preds, mutated = model.apply(
                variables, x, train=True, rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        else:
            preds = model.apply(variables, x, train=True, rngs={"dropout": dropout_rng})
            new_stats = batch_stats
        loss = multitask_loss(preds, y, add_indel_length=add_indel_length,
                              gamma=gamma, task_class_weights=task_class_weights)
        return loss, new_stats

    def step(state: TrainState, x, y, dropout_rng):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, y, dropout_rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_stats, new_opt_state, state.step + 1),
            loss,
        )

    if mesh is None:
        return jax.jit(step)

    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, data, data, rep),
        out_shardings=(rep, rep),
    )


def shard_train_state(state: TrainState, mesh) -> TrainState:
    rep = replicated_sharding(mesh)
    return TrainState(
        jax.device_put(state.params, rep),
        jax.device_put(state.batch_stats, rep) if state.batch_stats is not None else None,
        jax.device_put(state.opt_state, rep),
        jax.device_put(state.step, rep),
    )
