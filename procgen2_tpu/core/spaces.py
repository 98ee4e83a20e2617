"""Minimal space descriptors mirroring the reference's CEnv space surface.

The reference exposes spaces through the C ABI as tagged buffers
(`cenv/cenv.h:76-84`: CENV_SPACE_TYPE_BOX / CENV_SPACE_TYPE_MULTI_DISCRETE)
which `cenv/cenv.py:211-245` translates into gymnasium spaces. Here spaces are
plain Python descriptors; `procgen2_tpu.core.gym_adapter.GymEnv` adapts them
to gymnasium spaces when that package is installed.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Box:
    low: float
    high: float
    shape: Tuple[int, ...]
    dtype: np.dtype = np.uint8

    def sample(self, key):
        if np.issubdtype(self.dtype, np.integer):
            return jax.random.randint(
                key, self.shape, int(self.low), int(self.high) + 1, dtype=jnp.int32
            ).astype(self.dtype)
        return jax.random.uniform(
            key, self.shape, minval=self.low, maxval=self.high, dtype=self.dtype
        )


@dataclasses.dataclass(frozen=True)
class MultiDiscrete:
    nvec: Tuple[int, ...]

    def sample(self, key):
        keys = jax.random.split(key, len(self.nvec))
        return jnp.stack(
            [jax.random.randint(k, (), 0, n) for k, n in zip(keys, self.nvec)]
        )


@dataclasses.dataclass(frozen=True)
class Discrete:
    n: int

    def sample(self, key):
        return jax.random.randint(key, (), 0, self.n)
