"""Deterministic keyed RNG.

Replaces the reference's mutable per-worker sampler clones
(src/samplers/independent.cpp, renderjob.cpp:59-69) with counter-based
threefry keys derived per {pass, pixel, sample, purpose}. This gives
bit-reproducible renders independent of device count and work order —
the property the reference only approximates by cloning samplers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stable purpose tags so different consumers of randomness never collide.
P_EMISSION = 0
P_DISTANCE = 1
P_PHASE = 2
P_BSDF = 3
P_RR = 4
P_VOLVOL = 5
P_VOLSURF = 6
P_PIXEL = 7
P_CLUSTER = 8
P_CHANNEL = 9
P_SPECULAR = 10
P_TRACKING = 11


def make_root(seed: int) -> jax.Array:
    return jax.random.key(seed)


def fold(key, *ids):
    """Derive a subkey by folding in a sequence of integer ids."""
    for i in ids:
        key = jax.random.fold_in(key, i)
    return key


def uniform(key, shape=()):
    """U[0,1) float32, matching Sampler::next1D semantics."""
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def uniform2(key, shape=()):
    """U[0,1)^2, matching Sampler::next2D."""
    return jax.random.uniform(key, shape + (2,), dtype=jnp.float32)
