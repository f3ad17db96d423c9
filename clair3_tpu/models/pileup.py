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
        dt = self.compute_dtype
        if self.use_pallas_lstm and not train:
            return self._fused_full(x)
        else:
            x = x.astype(dt)
            x = BiLSTM(self.lstm1_units, param_dtype=self.param_dtype,
                       name="LSTM1")(x)
            x = BiLSTM(self.lstm2_units, param_dtype=self.param_dtype,
                       name="LSTM2")(x)
            x = nn.Dropout(0.2, deterministic=not train, name="L3_dropout")(x)
            x = x.reshape((x.shape[0], NO_OF_POSITIONS * 2 * self.lstm2_units))
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

    def _fused_full(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inference fast path: both BiLSTM layers, the L4 dense, AND every
        head branch (L5 dense + SELU-before-softmax) run as ONE VMEM-resident
        Pallas kernel (ops/pallas_pileup.py).  Declares the exact same
        parameter tree as the lax.scan branch so checkpoints are
        interchangeable."""
        import jax

        from clair3_tpu.ops.pallas_pileup import pileup_full_pallas

        init_wi = nn.initializers.lecun_normal()
        init_wh = nn.initializers.orthogonal()
        p = {}
        for lname, C, H in (
            ("LSTM1", self.input_channels, self.lstm1_units),
            ("LSTM2", 2 * self.lstm1_units, self.lstm2_units),
        ):
            scope = self.scope.push(lname)
            per_dir = []
            for d in ("fwd", "bwd"):
                sd = scope.push(d)
                per_dir.append((
                    sd.param("wi", init_wi, (C, 4 * H), self.param_dtype),
                    sd.param("wh", init_wh, (H, 4 * H), self.param_dtype),
                    sd.param("b", nn.initializers.zeros, (4 * H,), self.param_dtype),
                ))
            p[lname] = tuple(jnp.stack(w) for w in zip(*per_dir))
        s4 = self.scope.push("L4")
        flat = NO_OF_POSITIONS * 2 * self.lstm2_units
        wd = s4.param("kernel", init_wi, (flat, self.l4_units), self.param_dtype)
        bd = s4.param("bias", nn.initializers.zeros, (self.l4_units,), self.param_dtype)

        n_heads = 4 if self.add_indel_length else 2
        head_names = ("Y_gt21_logits", "Y_genotype_logits",
                      "Y_indel_length_logits_1", "Y_indel_length_logits_2")
        head_weights = []
        for i in range(n_heads):
            s5 = self.scope.push(f"L5_{i + 1}")
            head_weights.append(s5.param(
                "kernel", init_wi, (self.l4_units, self.l5_units), self.param_dtype))
            head_weights.append(s5.param(
                "bias", nn.initializers.zeros, (self.l5_units,), self.param_dtype))
            so = self.scope.push(head_names[i])
            head_weights.append(so.param(
                "kernel", init_wi, (self.l5_units, _HEAD_SIZES[i]), self.param_dtype))
            head_weights.append(so.param(
                "bias", nn.initializers.zeros, (_HEAD_SIZES[i],), self.param_dtype))

        return pileup_full_pallas(
            x,
            *p["LSTM1"], *p["LSTM2"],
            wd.reshape(NO_OF_POSITIONS, 2 * self.lstm2_units, self.l4_units),
            bd,
            tuple(head_weights),
            compute_dtype=self.compute_dtype,
            interpret=jax.default_backend() != "tpu",
        )
