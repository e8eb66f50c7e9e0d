"""Determinism helpers.

The reference seeds python/numpy/torch/cuda and flips cudnn toggles
(main.py:319-335).  In JAX determinism is structural — computation depends
only on explicit PRNG keys — so this reduces to seeding host-side numpy
(data order) and minting the root key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
