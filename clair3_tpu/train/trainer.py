"""Model training loop.

Reference semantics (clair3/Train.py:260-568): AdamW (lr 1e-3, per-mode
weight decay), per-task focal loss, HDF5 bin chunks assembled into batches,
random per-epoch chunk offset, mini-epoch subdivision, 90/10 validation
split, early stopping on validation loss, per-epoch checkpoints +
best_val_loss.  DDP/NCCL is replaced by a jit-compiled step over a
``jax.sharding.Mesh`` (clair3_tpu.train.step).
"""

from __future__ import annotations

import logging
import os
import random
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clair3_tpu.config import TrainConfig
from clair3_tpu.models import FullAlignmentNet, PileupNet
from clair3_tpu.models.params_io import save_variables
from clair3_tpu.train.data import BinDataset
from clair3_tpu.train.loss import multitask_loss
from clair3_tpu.train.step import create_train_state, make_train_step

logger = logging.getLogger(__name__)


def _pad_batch(x: np.ndarray, y: np.ndarray, multiple: int):
    """Pad the batch axis to a multiple (sharded steps require batch %
    n_devices == 0).  Padded labels are all-zero one-hots: focal loss
    -y*log(p)*(1-p)^g is exactly 0 for them, so padding only dilutes the
    batch mean, never the gradient direction."""
    n = len(x)
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x, y, n
    pad = target - n
    x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    y = np.concatenate([y, np.zeros((pad,) + y.shape[1:], y.dtype)])
    return x, y, n


def build_model(cfg: TrainConfig, input_channels: Optional[int] = None):
    if cfg.pileup:
        return PileupNet(
            add_indel_length=cfg.add_indel_length,
            input_channels=input_channels or 18,
        )
    return FullAlignmentNet(
        add_indel_length=cfg.add_indel_length,
        input_channels=input_channels or 8,
    )


def train_model(
    bin_paths: Sequence[str],
    output_dir: str,
    cfg: TrainConfig,
    mesh=None,
    max_steps: Optional[int] = None,
    init_variables: Optional[dict] = None,
    use_class_weights: bool = False,
) -> dict:
    """Train from HDF5 bins; returns {'best_val_loss', 'epochs', 'model_path'}."""
    os.makedirs(output_dir, exist_ok=True)
    dataset = BinDataset(bin_paths, chunk_size=cfg.chunk_size)
    if not dataset.chunks:
        raise ValueError("no training chunks found in bins")
    train_chunks, val_chunks = dataset.split_chunks(cfg.validation_fraction, cfg.seed)
    if not val_chunks:
        val_chunks = train_chunks[-1:]

    x0, _ = dataset.get_chunk(*dataset.chunks[0])
    input_channels = x0.shape[-1]
    model = build_model(cfg, input_channels)
    rng = jax.random.PRNGKey(cfg.seed)
    state, tx = create_train_state(
        model, rng, jnp.asarray(x0[:2]),
        learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay)
    if init_variables is not None:  # fine-tuning / resume
        import flax

        state = state.replace(
            params=jax.tree.map(jnp.asarray, init_variables["params"]),
            batch_stats=(jax.tree.map(jnp.asarray, init_variables["batch_stats"])
                         if "batch_stats" in init_variables else state.batch_stats))

    task_class_weights = None
    if use_class_weights:
        # effective-number class weights from the label distribution
        # (reference: Train.py:79-84 with --effective_label_num)
        from clair3_tpu.config import LABEL_SHAPE
        from clair3_tpu.train.loss import effective_class_weights
        import numpy as _np

        counts = _np.zeros(sum(LABEL_SHAPE))
        for b, c in dataset.chunks:
            _, y = dataset.get_chunk(b, c)
            counts += y.sum(axis=0)
        task_class_weights = []
        start = 0
        for size in LABEL_SHAPE:
            task_class_weights.append(jnp.asarray(
                effective_class_weights(_np.maximum(counts[start:start + size], 1))))
            start += size
    has_bn = state.batch_stats is not None
    step_fn = make_train_step(
        model, tx, add_indel_length=cfg.add_indel_length,
        has_batch_stats=has_bn, mesh=mesh, gamma=cfg.focal_gamma,
        task_class_weights=task_class_weights)

    @jax.jit
    def eval_loss(params, batch_stats, x, y):
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = batch_stats
        preds = model.apply(variables, x, train=False)
        return multitask_loss(preds, y, add_indel_length=cfg.add_indel_length,
                              gamma=cfg.focal_gamma,
                              task_class_weights=task_class_weights)

    chunks_per_batch = max(1, cfg.batch_size // cfg.chunk_size)
    py_rng = random.Random(cfg.seed)
    best_val = float("inf")
    best_path = os.path.join(output_dir, "best_val_loss.npz")
    patience = cfg.early_stop_patience * cfg.mini_epochs
    bad_epochs = 0
    total_steps = 0
    history = []

    for epoch in range(cfg.max_epoch):
        offset = py_rng.randrange(max(1, cfg.chunk_size // 2))
        order = list(train_chunks)
        py_rng.shuffle(order)
        mini = max(1, len(order) // cfg.mini_epochs)
        for mini_epoch in range(cfg.mini_epochs):
            t0 = time.time()
            epoch_loss, n_batches = 0.0, 0
            for x, y in dataset.batches(
                order[mini_epoch * mini: (mini_epoch + 1) * mini],
                chunks_per_batch, offset,
            ):
                if mesh is not None:
                    x, y, _ = _pad_batch(x, y, mesh.devices.size)
                dropout_rng = jax.random.fold_in(rng, total_steps)
                state, loss = step_fn(state, jnp.asarray(x), jnp.asarray(y), dropout_rng)
                epoch_loss += float(loss)
                n_batches += 1
                total_steps += 1
                if max_steps is not None and total_steps >= max_steps:
                    break
            train_loss = epoch_loss / max(1, n_batches)

            val_loss, n_val = 0.0, 0
            for x, y in dataset.batches(val_chunks, chunks_per_batch, 0):
                if mesh is not None:
                    x, y, _ = _pad_batch(x, y, mesh.devices.size)
                val_loss += float(eval_loss(state.params, state.batch_stats,
                                            jnp.asarray(x), jnp.asarray(y)))
                n_val += 1
            val_loss /= max(1, n_val)
            history.append((epoch, mini_epoch, train_loss, val_loss))
            logger.info("[train] epoch %d.%d loss=%.4f val=%.4f (%.1fs)",
                        epoch, mini_epoch, train_loss, val_loss, time.time() - t0)

            variables = {"params": state.params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            save_variables(os.path.join(output_dir, f"epoch_{epoch}_{mini_epoch}.npz"), variables)
            if val_loss < best_val:
                best_val = val_loss
                bad_epochs = 0
                save_variables(best_path, variables)
            else:
                bad_epochs += 1
            if bad_epochs >= patience:
                logger.info("[train] early stop at epoch %d.%d", epoch, mini_epoch)
                return {"best_val_loss": best_val, "epochs": epoch + 1,
                        "model_path": best_path, "history": history}
            if max_steps is not None and total_steps >= max_steps:
                return {"best_val_loss": best_val, "epochs": epoch + 1,
                        "model_path": best_path, "history": history}

    return {"best_val_loss": best_val, "epochs": cfg.max_epoch,
            "model_path": best_path, "history": history}
