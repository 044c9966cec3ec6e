"""ResNet backbones (Flax linen) for the segmentation detector.

Reference parity: the PixelLib model uses a ResNet-101 backbone
(train.py:49 ``network_backbone="resnet101"``).  Depths 18/50/101 are
supported — tests use 18, production uses 101.

BatchNorm runs in inference mode with learnable affine ("frozen BN"), the
standard choice for detector fine-tuning from a pretrained base; batch-stat
training is unnecessary at detection batch sizes and keeps the train step a
pure function under pjit.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


class FrozenBN(nn.Module):
    """Affine-only normalisation with stored (non-updating) running stats."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features)
        ).value
        inv = scale / jnp.sqrt(var + 1e-5)
        return x * inv + (bias - mean * inv)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), use_bias=False)(x)
        y = FrozenBN(self.features)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), use_bias=False)(y)
        y = FrozenBN(self.features)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), (self.strides, self.strides), use_bias=False
            )(x)
            residual = FrozenBN(self.features)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        y = FrozenBN(self.features)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), use_bias=False)(y)
        y = FrozenBN(self.features)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False)(y)
        y = FrozenBN(self.features * 4)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * 4, (1, 1), (self.strides, self.strides), use_bias=False
            )(x)
            residual = FrozenBN(self.features * 4)(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns the C2..C5 feature maps for FPN."""

    depth: int = 101

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        blocks = STAGE_BLOCKS[self.depth]
        bottleneck = self.depth >= 50
        block = Bottleneck if bottleneck else BasicBlock

        x = nn.Conv(64, (7, 7), (2, 2), use_bias=False)(x)
        x = FrozenBN(64)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")

        feats = []
        for stage, (n, f) in enumerate(zip(blocks, (64, 128, 256, 512))):
            for i in range(n):
                strides = 2 if (i == 0 and stage > 0) else 1
                x = block(f, strides)(x)
            feats.append(x)
        return tuple(feats)  # C2 (stride 4) .. C5 (stride 32)
