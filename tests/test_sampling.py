"""Sampling math tests: contraction, AABB, spacing, sample_pdf."""

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.ops import (
    contract,
    near_far_from_aabb,
    sample_pdf,
    searchsorted_right,
    spacing_fn,
    spacing_fn_inv,
    uncontract,
    uniform_bins,
)


def test_contract_inside_identity(rng):
    x = rng.uniform(-0.99, 0.99, (100, 3)).astype(np.float32)
    z = np.asarray(contract(jnp.asarray(x)))
    np.testing.assert_allclose(z, x, rtol=1e-6)


def test_contract_formula(rng):
    """Outside the unit cube: dominant coord -> sign*(2 - 1/mag), others /mag."""
    x = rng.uniform(1.5, 10.0, (200, 3)).astype(np.float32) * rng.choice(
        [-1, 1], (200, 3)
    ).astype(np.float32)
    z = np.asarray(contract(jnp.asarray(x)))
    mag = np.abs(x).max(-1)
    idx = np.abs(x).argmax(-1)
    for i in range(200):
        for d in range(3):
            if d == idx[i]:
                np.testing.assert_allclose(
                    z[i, d], x[i, d] * (2 - 1 / mag[i]) / mag[i], rtol=1e-5
                )
            else:
                np.testing.assert_allclose(z[i, d], x[i, d] / mag[i], rtol=1e-5)
    assert np.all(np.abs(z) <= 2.0 + 1e-5)


def test_contract_roundtrip(rng):
    x = rng.uniform(-50, 50, (500, 3)).astype(np.float32)
    z = contract(jnp.asarray(x))
    back = np.asarray(uncontract(z))
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-3)


def test_near_far_from_aabb():
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    rays_o = jnp.asarray([[0.0, 0, -5], [0, 0, -5], [5, 5, -5]])
    rays_d = jnp.asarray([[0.0, 0, 1], [0, 0, -1], [0, 0, 1]])
    near, far = near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.05)
    near, far = np.asarray(near), np.asarray(far)
    np.testing.assert_allclose(near[0, 0], 4.0, rtol=1e-5)
    np.testing.assert_allclose(far[0, 0], 6.0, rtol=1e-5)
    # pointing away: interval is behind the origin; near clamps to min_near,
    # far stays negative (matches renderer.py:122-139 — only far<near pre-clamp
    # counts as a miss)
    np.testing.assert_allclose(near[1, 0], 0.05, rtol=1e-5)
    assert far[1, 0] < 0
    assert near[2, 0] == 1e9 and far[2, 0] == 1e9  # misses the box


def test_spacing_roundtrip(rng):
    x = rng.uniform(0.05, 100, (1000,)).astype(np.float32)
    s = spacing_fn(jnp.asarray(x))
    back = np.asarray(spacing_fn_inv(s))
    np.testing.assert_allclose(back, x, rtol=1e-3)
    s_np = np.asarray(s)
    assert np.all((s_np >= 0) & (s_np <= 1))


def test_searchsorted_matches_numpy(rng):
    a = np.sort(rng.uniform(0, 1, (8, 17)), axis=-1).astype(np.float32)
    v = rng.uniform(-0.1, 1.1, (8, 9)).astype(np.float32)
    got = np.asarray(searchsorted_right(jnp.asarray(a), jnp.asarray(v)))
    for n in range(8):
        want = np.searchsorted(a[n], v[n], side="right")
        np.testing.assert_array_equal(got[n], want)


def test_sample_pdf_uniform_weights():
    """Uniform weights -> evenly spaced midpoint samples."""
    N, T0, T = 4, 16, 8
    bins = jnp.broadcast_to(jnp.linspace(0, 1, T0 + 1), (N, T0 + 1))
    weights = jnp.ones((N, T0))
    out = np.asarray(sample_pdf(bins, weights, T, key=None))
    want = np.linspace(0.5 / T, 1 - 0.5 / T, T)
    np.testing.assert_allclose(out, np.broadcast_to(want, (N, T)), atol=1e-4)


def test_sample_pdf_concentrates(rng):
    """Peaked weights concentrate samples in the peaked bin."""
    N, T0, T = 2, 16, 32
    bins = jnp.broadcast_to(jnp.linspace(0, 1, T0 + 1), (N, T0 + 1))
    w = np.full((N, T0), 1e-3, np.float32)
    w[:, 8] = 10.0  # peak at bin [0.5, 0.5625]
    out = np.asarray(sample_pdf(bins, jnp.asarray(w), T, key=None))
    frac_in_peak = np.mean((out >= 0.5) & (out <= 0.5625))
    assert frac_in_peak > 0.5


def test_sample_pdf_perturb_bounds(rng):
    N, T0, T = 4, 8, 16
    bins = jnp.broadcast_to(jnp.linspace(0, 1, T0 + 1), (N, T0 + 1))
    w = jnp.asarray(rng.uniform(0.1, 1, (N, T0)).astype(np.float32))
    out = np.asarray(sample_pdf(bins, w, T, key=jax.random.key(0)))
    assert np.all(out >= -1e-5) and np.all(out <= 1 + 1e-5)
    assert np.all(np.diff(out, axis=-1) >= -1e-4)  # still sorted


def test_uniform_bins():
    b = np.asarray(uniform_bins(3, 8, key=None))
    np.testing.assert_allclose(b, np.broadcast_to(np.linspace(0, 1, 9), (3, 9)), rtol=1e-6)
    bp = np.asarray(uniform_bins(3, 8, key=jax.random.key(1)))
    assert np.all((bp >= 0) & (bp <= 1))
    assert not np.allclose(b, bp)
