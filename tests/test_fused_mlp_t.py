"""Parity: transposed fused MLP kernel vs the XLA encode+MLP path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sanerf_tpu.models import fields
from sanerf_tpu.ops.freq import freq_encode
from sanerf_tpu.ops.fused_mlp_t import TransposedFieldMLP


def _ref(layers, x, enc_freqs, bound, skip_layers, leaky):
    enc = freq_encode(x * (jnp.pi / bound), enc_freqs)
    if skip_layers:
        out, _ = fields.apply_skip_mlp(layers, enc, skip_layers)
    else:
        out, _ = fields.apply_mlp(layers, enc)
    return out


@pytest.mark.parametrize("skip,leaky", [((), False), ((2,), True)])
def test_tmlp_matches_xla(rng, skip, leaky):
    enc_freqs, bound = 4, 4.0
    F = 3 * (1 + 2 * enc_freqs)
    if skip:
        layers = fields.init_skip_mlp(jax.random.key(0), F, 16, 32, 4, skip,
                                      bias=False)
    else:
        layers = fields.init_mlp(jax.random.key(0), F, 16, 32, 4, bias=False)
    x = jnp.asarray(rng.uniform(-bound, bound, (50, 3)).astype(np.float32))
    ref = np.asarray(_ref(layers, x, enc_freqs, bound, skip, leaky))

    tm = TransposedFieldMLP(layers, enc_freqs, bound, skip_layers=skip,
                            leaky=leaky, block=32, dtype=jnp.float32)
    got = np.asarray(tm(x))
    assert got.shape == (16, 50)
    np.testing.assert_allclose(got[:16].T, ref, rtol=2e-4, atol=2e-4)


def test_tmlp_bias_and_bf16(rng):
    enc_freqs, bound = 3, 2.0
    F = 3 * (1 + 2 * enc_freqs)
    layers = fields.init_mlp(jax.random.key(1), F, 8, 32, 3, bias=True)
    x = jnp.asarray(rng.uniform(-bound, bound, (40, 3)).astype(np.float32))
    ref = np.asarray(_ref(layers, x, enc_freqs, bound, (), False))

    tm = TransposedFieldMLP(layers, enc_freqs, bound, leaky=False, block=64,
                            dtype=jnp.float32)
    got = np.asarray(tm(x))
    np.testing.assert_allclose(got[:8].T, ref, rtol=2e-4, atol=2e-4)

    bf = TransposedFieldMLP(layers, enc_freqs, bound, leaky=False, block=64,
                            dtype=jnp.bfloat16)
    got_bf = np.asarray(bf(x))
    np.testing.assert_allclose(got_bf[:8].T, ref, rtol=0.05, atol=0.05)


def test_tmlp_pads_ragged_n(rng):
    layers = fields.init_mlp(jax.random.key(2), 21, 1, 16, 2, bias=False)
    x = jnp.asarray(rng.uniform(-1, 1, (37, 3)).astype(np.float32))
    tm = TransposedFieldMLP(layers, 3, 1.0, block=32, dtype=jnp.float32)
    out = np.asarray(tm(x))
    assert out.shape == (8, 37)
    ref = np.asarray(_ref(layers, x, 3, 1.0, (), False))
    np.testing.assert_allclose(out[:1].T, ref, rtol=2e-4, atol=2e-4)
    assert np.abs(out[1:]).max() == 0.0  # padded rows zeroed


def test_run_tmlp_traced_in_jit(rng):
    """run_tmlp packs in-trace — usable inside a jitted renderer."""
    layers = fields.init_skip_mlp(jax.random.key(3), 21, 16, 32, 4, (2,),
                                  bias=False)
    x = jnp.asarray(rng.uniform(-2, 2, (48, 3)).astype(np.float32))
    from sanerf_tpu.ops.fused_mlp_t import run_tmlp

    f = jax.jit(lambda p, x: run_tmlp(x, p, 3, 2.0, (2,), leaky=True,
                                      block=16))
    got = np.asarray(f(layers, x))
    ref = np.asarray(_ref(layers, x, 3, 2.0, (2,), True))
    np.testing.assert_allclose(got[:16].T, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ad", [True, False])
def test_run_tmlp_angle_double_parity(rng, ad):
    """Angle-doubling encode == dense-sin encode == XLA reference."""
    from sanerf_tpu.ops.fused_mlp_t import run_tmlp

    layers = fields.init_skip_mlp(jax.random.key(5), 39, 16, 32, 4, (2,),
                                  bias=False)
    x = jnp.asarray(rng.uniform(-2, 2, (64, 3)).astype(np.float32))
    ref = np.asarray(_ref(layers, x, 6, 2.0, (2,), True))
    got = np.asarray(run_tmlp(x, layers, 6, 2.0, (2,), leaky=True, block=32,
                              angle_double=ad))
    np.testing.assert_allclose(got[:16].T, ref, rtol=3e-4, atol=3e-4)
    # transposed feed too
    got_t = np.asarray(run_tmlp(x.T, layers, 6, 2.0, (2,), leaky=True,
                                block=32, angle_double=ad, transposed=True))
    np.testing.assert_allclose(got_t[:16].T, ref, rtol=3e-4, atol=3e-4)


def _ref_cp(layers, cp_lines, x, enc_freqs, bound, skip_layers, leaky):
    from sanerf_tpu.ops.cpgrid import line_features_ref

    enc = freq_encode(x * (jnp.pi / bound), enc_freqs)
    cp = line_features_ref(cp_lines, x, bound)
    enc = jnp.concatenate([enc, cp], axis=-1)
    if skip_layers:
        out, _ = fields.apply_skip_mlp(layers, enc, skip_layers)
    else:
        out, _ = fields.apply_mlp(layers, enc)
    return out


def test_run_tmlp_with_cp_lines(rng):
    """In-kernel CP line features == gather-reference XLA path."""
    from sanerf_tpu.ops.cpgrid import init_lines
    from sanerf_tpu.ops.fused_mlp_t import run_tmlp

    enc_freqs, bound, K, R = 4, 2.0, 8, 16
    F = 3 * (1 + 2 * enc_freqs)
    layers = fields.init_skip_mlp(jax.random.key(7), F + K, 16, 32, 4, (2,),
                                  bias=False)
    cp_lines = init_lines(jax.random.key(8), R, K)
    x = jnp.asarray(rng.uniform(-bound, bound, (64, 3)).astype(np.float32))
    # include exact domain corners (one-hot boundary handling)
    x = x.at[0].set(jnp.array([-bound, bound, 0.0]))
    ref = np.asarray(_ref_cp(layers, cp_lines, x, enc_freqs, bound, (2,),
                             True))
    got = np.asarray(run_tmlp(x, layers, enc_freqs, bound, (2,), leaky=True,
                              block=32, cp_lines=cp_lines))
    np.testing.assert_allclose(got[:16].T, ref, rtol=3e-4, atol=3e-4)


def test_composite_kernel_with_cp_lines(rng):
    """Fused field+composite kernel with CP == first-principles composite
    over the XLA field reference (shifted-softplus density, opaque bg)."""
    from sanerf_tpu.ops.cpgrid import init_lines
    from sanerf_tpu.ops.fused_mlp_t import run_tmlp_composite

    enc_freqs, bound, K, R = 3, 2.0, 8, 16
    N, T = 8, 4
    F = 3 * (1 + 2 * enc_freqs)
    layers = fields.init_skip_mlp(jax.random.key(9), F + K, 16, 32, 4, (2,),
                                  bias=False)
    cp_lines = init_lines(jax.random.key(10), R, K)
    x = jnp.asarray(rng.uniform(-bound, bound, (N * T, 3)).astype(np.float32))
    dl = jnp.asarray(rng.uniform(0.05, 0.2, (N, T)).astype(np.float32))
    ts = jnp.cumsum(dl, axis=1)

    f = _ref_cp(layers, cp_lines, x, enc_freqs, bound, (2,), True)  # [NT, 16]
    f = f.reshape(N, T, 16)
    sigma = jax.nn.softplus(f[..., 0] - 1.0)
    ds = dl * sigma
    ds_op = ds.at[:, -1].set(jnp.inf)  # opaque background
    alpha = 1.0 - jnp.exp(-ds_op)
    trans = jnp.exp(-jnp.cumsum(jnp.pad(ds[:, :-1], ((0, 0), (1, 0))), axis=1))
    w = alpha * trans
    gsum_ref = jnp.einsum("nt,ntc->nc", w, f)
    depth_ref = jnp.sum(w * ts, axis=1)
    wsum_ref = jnp.sum(w, axis=1)

    gsum, depth, wsum = run_tmlp_composite(
        x.T, dl, ts, layers, enc_freqs, bound, (2,), leaky=True, opaque=True,
        block=2 * T, cp_lines=cp_lines)
    np.testing.assert_allclose(np.asarray(gsum)[:, :16], np.asarray(gsum_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(wsum), np.asarray(wsum_ref),
                               rtol=1e-3, atol=1e-3)
