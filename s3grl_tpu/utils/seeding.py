"""Deterministic seeding.

The reference calls `torch_geometric.seed_everything` before data prep and
again before model init (sgrl_link_pred.py:1280,1585; sgrl_run_manager.py:142)
so each seeded run is a reproducibility oracle. Here a single call seeds
python/numpy and returns both a numpy Generator (host-side sampling) and a JAX
PRNGKey (device-side randomness) derived from the same seed.
"""
from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int):
    """Seed global RNGs; return (np.random.Generator, jax PRNGKey)."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed), jax.random.PRNGKey(seed)
