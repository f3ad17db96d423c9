"""Pileup network (reference architecture: clair3/model.py:58-161 ``Clair3_P``).

Input ``[B, 33, 18]`` integer pileup count tensors.  Two stacked
bidirectional LSTMs (128, 160), flatten, Dense-128 trunk, and 2 or 4
independent head branches.  Quirk preserved from the trained reference
checkpoints: each head applies SELU to its logits *before* softmax.

Output is the concatenation of the per-task probability vectors:
``[B, 24]`` (gt21 + zygosity) or ``[B, 90]`` with indel-length heads.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from clair3_tpu.config import (
    GT21_LABEL_COUNT,
    GENOTYPE_LABEL_COUNT,
    VARIANT_LENGTH_LABEL_COUNT,
    NO_OF_POSITIONS,
    PILEUP_CHANNEL_SIZE,
)
from clair3_tpu.ops.lstm import BiLSTM

_HEAD_SIZES = (
    GT21_LABEL_COUNT,
    GENOTYPE_LABEL_COUNT,
    VARIANT_LENGTH_LABEL_COUNT,
    VARIANT_LENGTH_LABEL_COUNT,
)


class PileupNet(nn.Module):
    add_indel_length: bool = False
    input_channels: int = PILEUP_CHANNEL_SIZE
    lstm1_units: int = 128
    lstm2_units: int = 160
    l4_units: int = 128
    l5_units: int = 128
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas_lstm: bool = False  # inference-only Pallas recurrence kernel

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.compute_dtype)
        x = BiLSTM(self.lstm1_units, param_dtype=self.param_dtype,
                   use_pallas=self.use_pallas_lstm, name="LSTM1")(x)
        x = BiLSTM(self.lstm2_units, param_dtype=self.param_dtype,
                   use_pallas=self.use_pallas_lstm, name="LSTM2")(x)
        x = nn.Dropout(0.2, deterministic=not train, name="L3_dropout")(x)
        x = x.reshape((x.shape[0], NO_OF_POSITIONS * 2 * self.lstm2_units))
        dt = self.compute_dtype
        x = nn.selu(nn.Dense(self.l4_units, dtype=dt, param_dtype=self.param_dtype, name="L4")(x))
        x = nn.Dropout(0.5, deterministic=not train, name="L4_dropout")(x)

        n_heads = 4 if self.add_indel_length else 2
        outs = []
        for i in range(n_heads):
            h = nn.selu(nn.Dense(self.l5_units, dtype=dt, param_dtype=self.param_dtype, name=f"L5_{i + 1}")(x))
            h = nn.Dropout(0.2, deterministic=not train, name=f"L5_{i + 1}_dropout")(h)
            head_names = ("Y_gt21_logits", "Y_genotype_logits",
                          "Y_indel_length_logits_1", "Y_indel_length_logits_2")
            logits = nn.Dense(_HEAD_SIZES[i], dtype=dt, param_dtype=self.param_dtype, name=head_names[i])(h)
            # SELU-before-softmax is baked into the trained reference weights.
            outs.append(nn.softmax(nn.selu(logits.astype(jnp.float32))))
        return jnp.concatenate(outs, axis=-1)
