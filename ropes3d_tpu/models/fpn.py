"""Feature Pyramid Network neck (P2..P6)."""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    features: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        """C2..C5 -> P2..P6 (P6 = stride-2 subsample of P5)."""
        laterals = [
            nn.Conv(self.features, (1, 1), name=f"lateral{i}")(c)
            for i, c in enumerate(feats)
        ]
        out = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = jax.image.resize(
                out[0], (lat.shape[0], lat.shape[1], lat.shape[2], out[0].shape[3]),
                method="nearest",
            )
            out.insert(0, lat + up)
        ps = [
            nn.Conv(self.features, (3, 3), name=f"post{i}")(p)
            for i, p in enumerate(out)
        ]
        p6 = nn.max_pool(ps[-1], (1, 1), strides=(2, 2))
        return (*ps, p6)  # P2, P3, P4, P5, P6
