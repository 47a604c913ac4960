"""Input feature encoders (reference layers.py:6-47).

Fourier features are computed inline in the jitted forward pass; the random
Fourier projection matrix B is a persistent (non-trainable) variable in the
"buffers" collection so it is checkpointed with the model, matching the
reference's persistent torch buffer (layers.py:32).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def fourier_freq_bands(k, use_logspace=False, max_freq=None):
    """Frequency bands: 2^i pi (logspace) or 2^linspace(0, max_freq, k+1)[:-1] pi
    (reference layers.py:13-17)."""
    if use_logspace:
        bands = 2.0 ** np.arange(0, k) * np.pi
    else:
        assert max_freq is not None, "max_freq required when use_logspace=False"
        bands = 2.0 ** np.linspace(0.0, max_freq, num=k + 1)[:-1] * np.pi
    return jnp.asarray(bands, dtype=jnp.float32)


class FourierFeatEnc(nn.Module):
    """cos/sin positional encoding; output dim = in_dim * k * 2 (+ in_dim)."""

    k: int
    include_input: bool = True
    use_logspace: bool = False
    max_freq: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        bands = fourier_freq_bands(self.k, self.use_logspace, self.max_freq)
        embed = (x[..., None] * bands).reshape(*x.shape[:-1], -1)
        parts = [jnp.cos(embed), jnp.sin(embed)]
        if self.include_input:
            parts.append(x)
        return jnp.concatenate(parts, axis=-1)


class RandomFourierFeatEnc(nn.Module):
    """Gaussian random Fourier features; B ~ N(0, std^2) of shape [in_dim, k]
    is a persistent buffer (reference layers.py:28-39)."""

    k: int
    std: float = 1.0
    in_dim: int = 3
    include_input: bool = True

    @nn.compact
    def __call__(self, x):
        B = self.variable(
            "buffers",
            "B",
            lambda: self.std
            * jax.random.normal(self.make_rng("buffers"), (self.in_dim, self.k), jnp.float32),
        )
        embed = (2.0 * jnp.pi * x) @ jax.lax.stop_gradient(B.value)
        parts = [jnp.cos(embed), jnp.sin(embed)]
        if self.include_input:
            parts.append(x)
        return jnp.concatenate(parts, axis=-1)
