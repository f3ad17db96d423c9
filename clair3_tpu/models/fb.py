"""Experimental full-alignment binary scorer (reference: clair3/model.py:419-509
``Clair3_FB``).  Unused by any reference pipeline (SURVEY.md §2.2) but kept
for inventory parity: separable-conv stages (48/96/160), a 4-head MHSA block
over the flattened feature map, global avg+max pooling, and a sigmoid score.

Note: the reference's ``dense1`` expects 96*2 inputs while its pooled vector
is (160+96)*2 wide — a latent shape bug in the (dead) reference code.  This
implementation wires the pooled width correctly.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from clair3_tpu.config import FA_CHANNEL_SIZE, FA_NORMALIZE_NUM


class SeparableConv(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            x.shape[-1], (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), feature_group_count=x.shape[-1],
            use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            name="depthwise")(x)
        return nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="pointwise")(x)


class SepConvBNRelu(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = SeparableConv(self.features, self.strides, self.dtype,
                          self.param_dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        return nn.relu(x)


class SepResBlock(nn.Module):
    features: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        residual = x
        y = SeparableConv(self.features, 1, self.dtype, self.param_dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, momentum=0.9,
                         dtype=self.dtype, param_dtype=self.param_dtype, name="bn1")(y)
        y = nn.relu(y)
        y = SeparableConv(self.features, 1, self.dtype, self.param_dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, momentum=0.9,
                         dtype=self.dtype, param_dtype=self.param_dtype, name="bn2")(y)
        return nn.relu(residual + y)


class FullAlignmentBinaryNet(nn.Module):
    """Binary variant-quality scorer: [B, depth, 33, C] -> [B, 1] in (0, 1)."""

    input_channels: int = FA_CHANNEL_SIZE
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        dt = self.compute_dtype
        x = x.astype(dt) / FA_NORMALIZE_NUM
        x = SepConvBNRelu(48, 2, dt, self.param_dtype, name="conv1")(x, train=train)
        x = SepResBlock(48, dt, self.param_dtype, name="res1")(x, train=train)
        x = SepConvBNRelu(96, 2, dt, self.param_dtype, name="conv2")(x, train=train)
        x = SepResBlock(96, dt, self.param_dtype, name="res2")(x, train=train)
        x = SepConvBNRelu(160, 2, dt, self.param_dtype, name="conv3")(x, train=train)
        x = SepResBlock(160, dt, self.param_dtype, name="res3")(x, train=train)

        attn_in = nn.selu(nn.Conv(96, (1, 1), dtype=dt, param_dtype=self.param_dtype,
                                  name="attn_proj")(x))
        B, H, W, C = attn_in.shape
        seq = attn_in.reshape(B, H * W, C)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=4, dtype=dt, param_dtype=self.param_dtype,
            deterministic=not train, dropout_rate=0.1, name="attn_mha")(seq, seq)
        attn = nn.Dropout(0.2, deterministic=not train, name="attn_dropout")(attn)
        seq = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=self.param_dtype,
                           name="attn_norm")(seq + attn)
        attn_map = seq.reshape(B, H, W, C)

        x = jnp.concatenate([x, attn_map], axis=-1)  # [B, H, W, 256]
        pooled = jnp.concatenate([x.mean(axis=(1, 2)), x.max(axis=(1, 2))], axis=-1)

        h = nn.Dropout(0.35, deterministic=not train, name="dropout1")(pooled)
        h = nn.selu(nn.Dense(128, dtype=dt, param_dtype=self.param_dtype, name="dense1")(h))
        h = nn.Dropout(0.25, deterministic=not train, name="dropout2")(h)
        h = nn.selu(nn.Dense(96, dtype=dt, param_dtype=self.param_dtype, name="dense2")(h))
        logit = nn.Dense(1, dtype=dt, param_dtype=self.param_dtype, name="logit")(h)
        return nn.sigmoid(logit.astype(jnp.float32))
