"""Hash-grid encoder unit tests.

The oracle is an independent scalar numpy implementation of the instant-ngp
semantics (hash = xor of per-dim primes; dense linear index when the table
fits; trilinear interp of the 2^D corners; OOB -> 0), re-derived from
gridencoder/src/gridencoder.cu:45-201.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_tpu.config import HashGridConfig
from sanerf_tpu.ops import hashgrid

PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


def oracle_encode(x01, table, spec):
    """Scalar-loop numpy oracle."""
    B, D = x01.shape
    L, C = spec.num_levels, spec.level_dim
    out = np.zeros((B, L, C), np.float32)
    for b in range(B):
        if np.any((x01[b] < 0) | (x01[b] > 1)):
            continue
        for lvl in range(L):
            res = spec.resolutions[lvl]
            size = spec.sizes[lvl]
            if spec.align_corners:
                pos = x01[b] * (res - 1)
                pg = np.minimum(np.floor(pos), res - 2).astype(np.int64)
            else:
                pos = np.clip(x01[b] * res - 0.5, 0, res - 1)
                pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            if spec.interpolation == "smoothstep":
                frac = frac * frac * (3 - 2 * frac)
            for corner in range(1 << D):
                w = 1.0
                pc = np.empty(D, np.int64)
                for d in range(D):
                    if (corner >> d) & 1:
                        w *= frac[d]
                        pc[d] = min(pg[d] + 1, res - 1)
                    else:
                        w *= 1 - frac[d]
                        pc[d] = pg[d]
                # index
                idx = np.uint32(0)
                stride = 1
                for d in range(D):
                    if stride > size:
                        break
                    idx = np.uint32(idx + np.uint32(pc[d]) * np.uint32(stride & 0xFFFFFFFF))
                    stride *= res
                if spec.hashed[lvl]:
                    h = np.uint32(0)
                    for d in range(D):
                        h = np.uint32(h ^ (np.uint32(pc[d]) * np.uint32(PRIMES[d])))
                    idx = h
                row = int(idx % np.uint32(size)) + spec.offsets[lvl]
                out[b, lvl] += w * table[row]
    return out.reshape(B, L * C)


@pytest.mark.parametrize(
    "cfg",
    [
        HashGridConfig(num_levels=4, level_dim=2, base_resolution=4, log2_hashmap_size=7,
                       desired_resolution=32),
        HashGridConfig(num_levels=3, level_dim=4, base_resolution=4, log2_hashmap_size=6,
                       desired_resolution=64, gridtype="tiled"),
        HashGridConfig(num_levels=3, level_dim=2, base_resolution=4, log2_hashmap_size=8,
                       desired_resolution=16, interpolation="smoothstep"),
        HashGridConfig(num_levels=2, level_dim=2, base_resolution=4, log2_hashmap_size=10,
                       desired_resolution=8, align_corners=True),
    ],
)
def test_forward_matches_oracle(cfg, rng):
    spec = hashgrid.build_spec(cfg)
    table = rng.standard_normal((spec.total_params, spec.level_dim)).astype(np.float32)
    x01 = rng.uniform(-0.1, 1.1, (64, 3)).astype(np.float32)  # includes OOB
    got = np.asarray(hashgrid.hash_encode_01(jnp.asarray(x01), jnp.asarray(table), spec))
    want = oracle_encode(x01, table, spec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bound_mapping(rng):
    spec = hashgrid.build_spec(HashGridConfig(num_levels=2, base_resolution=4,
                                              desired_resolution=8, log2_hashmap_size=10))
    table = rng.standard_normal((spec.total_params, spec.level_dim)).astype(np.float32)
    x = rng.uniform(-2, 2, (16, 3)).astype(np.float32)
    got = hashgrid.hash_encode(jnp.asarray(x), jnp.asarray(table), spec, bound=2.0)
    want = hashgrid.hash_encode_01(jnp.asarray((x + 2) / 4), jnp.asarray(table), spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_oob_is_zero(rng):
    spec = hashgrid.build_spec(HashGridConfig(num_levels=2, base_resolution=4,
                                              desired_resolution=8, log2_hashmap_size=10))
    table = rng.standard_normal((spec.total_params, spec.level_dim)).astype(np.float32)
    x01 = np.array([[1.5, 0.5, 0.5], [-0.01, 0.2, 0.2]], np.float32)
    out = np.asarray(hashgrid.hash_encode_01(jnp.asarray(x01), jnp.asarray(table), spec))
    assert np.all(out == 0)


def test_max_level(rng):
    spec = hashgrid.build_spec(HashGridConfig(num_levels=4, base_resolution=4,
                                              desired_resolution=32, log2_hashmap_size=8))
    table = rng.standard_normal((spec.total_params, spec.level_dim)).astype(np.float32)
    x01 = rng.uniform(0, 1, (8, 3)).astype(np.float32)
    full = np.asarray(hashgrid.hash_encode_01(jnp.asarray(x01), jnp.asarray(table), spec))
    part = np.asarray(
        hashgrid.hash_encode_01(jnp.asarray(x01), jnp.asarray(table), spec, max_level=2)
    )
    C = spec.level_dim
    np.testing.assert_allclose(part[:, : 2 * C], full[:, : 2 * C], rtol=1e-6)
    assert np.all(part[:, 2 * C :] == 0)


def test_table_gradient_finite_difference(rng):
    spec = hashgrid.build_spec(HashGridConfig(num_levels=2, level_dim=2, base_resolution=4,
                                              desired_resolution=8, log2_hashmap_size=5))
    table = rng.standard_normal((spec.total_params, spec.level_dim)).astype(np.float32)
    x01 = rng.uniform(0.05, 0.95, (8, 3)).astype(np.float32)

    def f(t):
        return jnp.sum(hashgrid.hash_encode_01(jnp.asarray(x01), t, spec) ** 2)

    g = np.asarray(jax.grad(f)(jnp.asarray(table)))
    eps = 1e-3
    idx = np.unravel_index(np.argmax(np.abs(g)), g.shape)
    tp = table.copy()
    tp[idx] += eps
    tm = table.copy()
    tm[idx] -= eps
    fd = (float(f(jnp.asarray(tp))) - float(f(jnp.asarray(tm)))) / (2 * eps)
    np.testing.assert_allclose(g[idx], fd, rtol=1e-2)


def test_input_gradient_finite_difference(rng):
    spec = hashgrid.build_spec(HashGridConfig(num_levels=2, level_dim=2, base_resolution=4,
                                              desired_resolution=8, log2_hashmap_size=10))
    table = rng.standard_normal((spec.total_params, spec.level_dim)).astype(np.float32)
    x01 = rng.uniform(0.3, 0.7, (4, 3)).astype(np.float64).astype(np.float32)

    def f(x):
        return jnp.sum(hashgrid.hash_encode_01(x, jnp.asarray(table), spec) ** 2)

    g = np.asarray(jax.grad(f)(jnp.asarray(x01)))
    eps = 1e-4
    for trial in range(3):
        idx = (trial, trial % 3)
        xp = x01.copy()
        xp[idx] += eps
        xm = x01.copy()
        xm[idx] -= eps
        fd = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=5e-2, atol=1e-3)


def test_grad_weight_decay(rng):
    spec = hashgrid.build_spec(HashGridConfig(num_levels=2, base_resolution=4,
                                              desired_resolution=8, log2_hashmap_size=10))
    table = rng.standard_normal((spec.total_params, spec.level_dim)).astype(np.float32)
    g = np.asarray(hashgrid.grad_weight_decay(jnp.asarray(table), spec, weight=0.1))
    # level-meaned: 2 * w * emb / level_size
    for lvl in range(spec.num_levels):
        o, s = spec.offsets[lvl], spec.sizes[lvl]
        np.testing.assert_allclose(g[o : o + s], 2 * 0.1 * table[o : o + s] / s, rtol=1e-6)


def test_grad_tv_zero_for_constant_table(rng):
    spec = hashgrid.build_spec(HashGridConfig(num_levels=2, base_resolution=4,
                                              desired_resolution=8, log2_hashmap_size=10))
    table = np.full((spec.total_params, spec.level_dim), 0.5, np.float32)
    x01 = rng.uniform(0, 1, (32, 3)).astype(np.float32)
    g = np.asarray(hashgrid.grad_total_variation(jnp.asarray(x01), jnp.asarray(table), spec, 1.0))
    np.testing.assert_allclose(g, 0.0, atol=1e-6)


def test_grad_tv_descends_tv(rng):
    """Stepping against the TV grad should reduce total variation."""
    spec = hashgrid.build_spec(HashGridConfig(num_levels=1, base_resolution=8,
                                              desired_resolution=8, log2_hashmap_size=12))
    table = rng.standard_normal((spec.total_params, spec.level_dim)).astype(np.float32)
    x01 = rng.uniform(0, 1, (512, 3)).astype(np.float32)

    def tv_energy(t):
        # direct TV energy at sampled floor corners
        res = spec.resolutions[0]
        pg = np.clip(np.floor(np.clip(x01 * res - 0.5, 0, res - 1)), 0, res - 1).astype(int)
        e = 0.0
        for d in range(3):
            for sign in (1, -1):
                pc = pg.copy()
                valid = (pc[:, d] + sign >= 0) & ((pc[:, d] < res) if sign > 0 else (pc[:, d] > 0))
                pc[:, d] += sign
                i0 = pg[:, 0] + pg[:, 1] * res + pg[:, 2] * res * res
                i1 = pc[:, 0] + pc[:, 1] * res + pc[:, 2] * res * res
                i0 = i0 % spec.sizes[0]
                i1 = i1 % spec.sizes[0]
                diff = np.where(valid[:, None], t[i0] - t[i1], 0)
                e += np.sum(np.sqrt(np.sum(diff**2, -1) + 1e-9))
        return e

    g = np.asarray(hashgrid.grad_total_variation(jnp.asarray(x01), jnp.asarray(table), spec, 1.0))
    assert np.any(g != 0)
    stepped = table - 0.05 * g
    assert tv_energy(stepped) < tv_energy(table)
