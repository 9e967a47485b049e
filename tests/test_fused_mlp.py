"""Fused field-MLP Pallas kernel: exactness vs the XLA path (CPU interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.models import fields
from sanerf_tpu.ops import fused_mlp
from sanerf_tpu.ops.freq import freq_encode


def _layers(rng, dims):
    return [{"w": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.05)}
            for d in dims]


def test_fused_matches_plain_mlp(rng):
    dims = [(33, 64), (64, 64), (64, 16)]
    layers = _layers(rng, dims)
    x = jnp.asarray(rng.uniform(-2, 2, (300, 3)).astype(np.float32))
    f = fused_mlp.FusedFieldMLP(layers, 5, 4.0, skip_layers=(), dtype=jnp.float32)
    got = np.asarray(f(x, block=256))
    enc = freq_encode(x * (jnp.pi / 4.0), 5)
    want, _ = fields.apply_mlp(layers, enc)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)


def test_fused_matches_skip_mlp(rng):
    dims = [(63, 128)] + [(128, 128)] * 2 + [(128 + 63, 128)] + [(128, 16)]
    layers = _layers(rng, dims)
    x = jnp.asarray(rng.uniform(-2, 2, (256, 3)).astype(np.float32))
    f = fused_mlp.FusedFieldMLP(layers, 10, 128.0, skip_layers=(3,), dtype=jnp.float32)
    got = np.asarray(f(x, block=256))
    enc = freq_encode(x * (jnp.pi / 128.0), 10)
    want, _ = fields.apply_skip_mlp(layers, enc, (3,))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)


def test_ragged_n_padding(rng):
    dims = [(33, 64), (64, 8)]
    layers = _layers(rng, dims)
    x = jnp.asarray(rng.uniform(-1, 1, (777, 3)).astype(np.float32))
    f = fused_mlp.FusedFieldMLP(layers, 5, 2.0, dtype=jnp.float32)
    got = np.asarray(f(x, block=512))
    assert got.shape == (777, 8)
    enc = freq_encode(x * (jnp.pi / 2.0), 5)
    want, _ = fields.apply_mlp(layers, enc)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)
