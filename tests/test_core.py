"""Core math / warp / RNG tests (counterpart of the reference's
test_la / test_samplers / test_random plugins, src/tests/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alvrl_tpu.core import math as m
from alvrl_tpu.core import rng, spectrum, warp


def test_build_frame_orthonormal():
    key = jax.random.key(0)
    n = m.normalize(jax.random.normal(key, (64, 3)))
    s, t = m.build_frame(n)
    np.testing.assert_allclose(m.dot(s, t), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.dot(s, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.dot(t, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.length(s), 1.0, atol=1e-5)
    np.testing.assert_allclose(m.cross(s, t), n, atol=1e-5)


def test_frame_roundtrip():
    key = jax.random.key(1)
    n = m.normalize(jax.random.normal(key, (16, 3)))
    v = jax.random.normal(jax.random.key(2), (16, 3))
    s, t = m.build_frame(n)
    v_local = m.frame_to_local(s, t, n, v)
    v_back = m.frame_to_world(s, t, n, v_local)
    np.testing.assert_allclose(v_back, v, atol=1e-5)


def test_uniform_sphere_moments():
    u = rng.uniform2(jax.random.key(3), (20000,))
    d = warp.square_to_uniform_sphere(u)
    np.testing.assert_allclose(m.length(d), 1.0, atol=1e-5)
    assert np.abs(np.mean(np.asarray(d), axis=0)).max() < 0.02


def test_cosine_hemisphere():
    u = rng.uniform2(jax.random.key(4), (20000,))
    d = warp.square_to_cosine_hemisphere(u)
    assert np.all(np.asarray(d[..., 2]) >= 0)
    # E[cos theta] = 2/3 for pdf = cos/pi
    assert abs(float(jnp.mean(d[..., 2])) - 2.0 / 3.0) < 0.01


def test_luminance():
    white = jnp.ones((3,))
    assert abs(float(spectrum.luminance(white)) - 1.0) < 1e-5


def test_safe_divide():
    out = m.safe_divide(jnp.array([1.0, 2.0]), jnp.array([0.0, 2.0]))
    np.testing.assert_allclose(out, [0.0, 1.0])
    g = jax.grad(lambda x: m.safe_divide(x, jnp.float32(0.0)))(jnp.float32(3.0))
    assert np.isfinite(float(g))


def test_rng_purpose_separation():
    k = rng.make_root(7)
    a = rng.uniform(rng.fold(k, 0, rng.P_PHASE), (100,))
    b = rng.uniform(rng.fold(k, 0, rng.P_BSDF), (100,))
    assert not np.allclose(np.asarray(a), np.asarray(b))
