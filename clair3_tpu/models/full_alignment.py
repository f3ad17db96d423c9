"""Full-alignment network (reference architecture: clair3/model.py:282-416
``Clair3_F``).

Input ``[B, depth, 33, 8|9]`` int8 tensors, normalized by /100.  Three
stride-2 conv stages (64/128/256) each followed by one residual block, a
spatial pyramid max-pool (3x3 + 2x2 + 1x1 cells = 14 x 256 = 3584 features),
a Dense-256 trunk, and 4 heads.  We run natively in NHWC (TPU's preferred
conv layout); the reference permutes its pooled features back to NHWC order
before flattening (clair3/model.py:277), so the dense-layer weight ordering
is identical.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from clair3_tpu.config import (
    GT21_LABEL_COUNT,
    GENOTYPE_LABEL_COUNT,
    VARIANT_LENGTH_LABEL_COUNT,
    FA_CHANNEL_SIZE,
    FA_NORMALIZE_NUM,
)

_HEAD_SIZES = (
    GT21_LABEL_COUNT,
    GENOTYPE_LABEL_COUNT,
    VARIANT_LENGTH_LABEL_COUNT,
    VARIANT_LENGTH_LABEL_COUNT,
)


class ConvBNRelu(nn.Module):
    """Conv 3x3 + BatchNorm(eps=1e-3) + ReLU (reference: model.py:183-197)."""

    filters: int
    strides: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.filters, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-3, momentum=0.9,
            param_dtype=self.param_dtype, dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    """Two 3x3 convs with BN and an identity shortcut (model.py:200-235).

    All reference instantiations use stride 1 with matching channel counts,
    so the downsample branch is the identity.
    """

    filters: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, momentum=0.9,
                         param_dtype=self.param_dtype, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, momentum=0.9,
                         param_dtype=self.param_dtype, dtype=self.dtype, name="bn2")(y)
        return nn.relu(residual + y)


def pyramid_pool(x: jnp.ndarray, pool_sizes: Sequence[int] = (3, 2, 1)) -> jnp.ndarray:
    """Spatial pyramid max-pooling over NHWC, matching model.py:245-279.

    Zero-pads (values are post-ReLU, so >= 0) centered, then max-pools with
    window == stride = ceil(dim / pool_size), flattening in NHWC order.
    """
    B, H, W, C = x.shape
    pooled = []
    for p in pool_sizes:
        wh, ww = math.ceil(H / p), math.ceil(W / p)
        out_h, out_w = math.ceil(H / wh), math.ceil(W / ww)
        pad_h = max((out_h - 1) * wh + wh - H, 0)
        pad_w = max((out_w - 1) * ww + ww - W, 0)
        xp = jnp.pad(
            x,
            ((0, 0), (pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
        )
        m = nn.max_pool(xp, window_shape=(wh, ww), strides=(wh, ww))
        pooled.append(m.reshape(B, -1))
    return jnp.concatenate(pooled, axis=1)


class FullAlignmentNet(nn.Module):
    add_indel_length: bool = True
    input_channels: int = FA_CHANNEL_SIZE
    l4_units: int = 256
    l5_units: int = 128
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas_conv1: bool = False  # inference-only banded-matmul conv1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        dt = self.compute_dtype
        if self.use_pallas_conv1 and not train:
            # OPT-IN EXPERIMENT (CLAIR3T_ENABLE_FA_CONV1=1, measured ~3x
            # slower than XLA's conv1 on v5e — scripts/bench_fa_conv1.py):
            # conv1 as one banded matmul with /NORM, the conv bias, the
            # inference BN affine, and the ReLU folded in
            # (ops/pallas_fa.py).  Declares the exact same parameter tree
            # as ConvBNRelu so checkpoints are interchangeable.
            x = self._fused_conv1(x)
        else:
            x = x.astype(dt) / FA_NORMALIZE_NUM
            x = ConvBNRelu(64, strides=2, dtype=dt, param_dtype=self.param_dtype, name="conv1")(x, train=train)
        x = ResBlock(64, dtype=dt, param_dtype=self.param_dtype, name="res_block1")(x, train=train)
        x = ConvBNRelu(128, strides=2, dtype=dt, param_dtype=self.param_dtype, name="conv3")(x, train=train)
        x = ResBlock(128, dtype=dt, param_dtype=self.param_dtype, name="res_block2")(x, train=train)
        x = ConvBNRelu(256, strides=2, dtype=dt, param_dtype=self.param_dtype, name="conv5")(x, train=train)
        x = ResBlock(256, dtype=dt, param_dtype=self.param_dtype, name="res_block3")(x, train=train)

        x = pyramid_pool(x)  # [B, 14*256]
        x = nn.Dropout(0.2, deterministic=not train, name="L3_dropout")(x)
        x = nn.selu(nn.Dense(self.l4_units, dtype=dt, param_dtype=self.param_dtype, name="L4")(x))
        x = nn.Dropout(0.5, deterministic=not train, name="L4_dropout")(x)

        n_heads = 4 if self.add_indel_length else 2
        outs = []
        head_names = ("Y_gt21_logits", "Y_genotype_logits",
                      "Y_indel_length_logits_1", "Y_indel_length_logits_2")
        for i in range(n_heads):
            h = nn.selu(nn.Dense(self.l5_units, dtype=dt, param_dtype=self.param_dtype, name=f"L5_{i + 1}")(x))
            h = nn.Dropout(0.2, deterministic=not train, name=f"L5_{i + 1}_dropout")(h)
            logits = nn.Dense(_HEAD_SIZES[i], dtype=dt, param_dtype=self.param_dtype, name=head_names[i])(h)
            # SELU-before-softmax matches the trained reference checkpoints.
            outs.append(nn.softmax(nn.selu(logits.astype(jnp.float32))))
        return jnp.concatenate(outs, axis=-1)

    def _fused_conv1(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inference fast path for the first ConvBNRelu via the Pallas
        banded-matmul kernel.  Declares conv1's parameters and batch stats
        at the exact paths ConvBNRelu(name='conv1') would, so checkpoints
        drive either branch."""
        import jax

        from clair3_tpu.ops.pallas_fa import fa_conv1_pallas

        C, F = self.input_channels, 64
        sc = self.scope.push("conv1")
        scc = sc.push("conv")
        kernel = scc.param("kernel", nn.initializers.lecun_normal(),
                           (3, 3, C, F), self.param_dtype)
        bias = scc.param("bias", nn.initializers.zeros, (F,),
                         self.param_dtype)
        scb = sc.push("bn")
        gamma = scb.param("scale", nn.initializers.ones, (F,),
                          self.param_dtype)
        beta = scb.param("bias", nn.initializers.zeros, (F,),
                         self.param_dtype)
        mean = scb.variable("batch_stats", "mean",
                            lambda s: jnp.zeros(s, jnp.float32), (F,)).value
        var = scb.variable("batch_stats", "var",
                           lambda s: jnp.ones(s, jnp.float32), (F,)).value
        return fa_conv1_pallas(
            x, kernel, bias, gamma, beta, mean, var,
            eps=1e-3, norm=float(FA_NORMALIZE_NUM),
            compute_dtype=self.compute_dtype,
            interpret=jax.default_backend() != "tpu")
