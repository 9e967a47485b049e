"""Compositing + loss tests vs naive O(T^2)/loop oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.ops import (
    compute_weights,
    composite,
    distort_loss,
    entropy_loss,
    label_regularization,
    proposal_loss,
    rgb_similarity_loss,
    trunc_exp,
)


def _naive_weights(real_bins, sigmas, opaque):
    N, T = sigmas.shape
    deltas = real_bins[:, 1:] - real_bins[:, :-1]
    ds = deltas * sigmas
    if opaque:
        ds = ds.copy()
        ds[:, -1] = np.inf
    w = np.zeros_like(sigmas)
    for n in range(N):
        trans = 1.0
        for t in range(T):
            alpha = 1 - np.exp(-ds[n, t])
            w[n, t] = alpha * trans
            trans *= np.exp(-ds[n, t])
    return w


def test_weights_match_naive(rng):
    N, T = 8, 16
    bins = np.sort(rng.uniform(0.1, 5, (N, T + 1)), axis=-1).astype(np.float32)
    sigmas = rng.uniform(0, 3, (N, T)).astype(np.float32)
    for opaque in (False, True):
        got = np.asarray(compute_weights(jnp.asarray(bins), jnp.asarray(sigmas), opaque))
        want = _naive_weights(bins, sigmas, opaque)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        if opaque:
            np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_composite_shapes(rng):
    N, T = 4, 8
    w = rng.uniform(0, 1, (N, T)).astype(np.float32)
    t = rng.uniform(0, 1, (N, T)).astype(np.float32)
    v = rng.uniform(0, 1, (N, T, 3)).astype(np.float32)
    ws, depth, vs = composite(jnp.asarray(w), jnp.asarray(t), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(ws), w.sum(-1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), (w * t).sum(-1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vs), (w[..., None] * v).sum(-2), rtol=1e-5)


def test_distort_loss_vs_quadratic(rng):
    N, T = 6, 12
    bins = np.sort(rng.uniform(0, 1, (N, T + 1)), axis=-1).astype(np.float32)
    w = rng.uniform(0, 0.3, (N, T)).astype(np.float32)
    got = float(distort_loss(jnp.asarray(bins), jnp.asarray(w)))
    # naive O(T^2) oracle
    intervals = bins[:, 1:] - bins[:, :-1]
    mids = bins[:, :-1] + intervals / 2
    total = 0.0
    for n in range(N):
        bi = 0.0
        for i in range(T):
            for j in range(T):
                bi += w[n, i] * w[n, j] * abs(mids[n, i] - mids[n, j])
        total += bi + (1 / 3) * np.sum(w[n] ** 2 * intervals[n])
    want = total / N
    np.testing.assert_allclose(got, want, rtol=1e-4)


def _naive_interlevel(t0, w0, t1, w1):
    """numpy oracle of renderer.py:35-49."""
    N, T = w0.shape
    cw1 = np.concatenate([np.zeros((N, 1)), np.cumsum(w1, -1)], -1)
    out = np.zeros_like(w0)
    T1 = w1.shape[-1]
    for n in range(N):
        lo = np.clip(np.searchsorted(t1[n, :-1], t0[n, :-1], side="right") - 1, 0, T1 - 1)
        hi = np.clip(np.searchsorted(t1[n, 1:], t0[n, 1:], side="right"), 0, T1 - 1)
        w = cw1[n, 1:][hi] - cw1[n, :-1][lo]
        out[n] = np.clip(w0[n] - w, 0, None) ** 2 / (w0[n] + 1e-8)
    return out


def test_proposal_loss_vs_oracle(rng):
    N = 5
    bins_p = np.sort(rng.uniform(0, 1, (N, 9)), -1).astype(np.float32)
    w_p = rng.uniform(0, 0.3, (N, 8)).astype(np.float32)
    bins_f = np.sort(rng.uniform(0, 1, (N, 5)), -1).astype(np.float32)
    w_f = rng.uniform(0, 0.3, (N, 4)).astype(np.float32)
    got = float(
        proposal_loss(
            [jnp.asarray(bins_p), jnp.asarray(bins_f)],
            [jnp.asarray(w_p), jnp.asarray(w_f)],
        )
    )
    want = _naive_interlevel(bins_f, w_f, bins_p, w_p).mean()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_proposal_loss_zero_when_bounded():
    """When a proposal level upper-bounds the final histogram exactly, the
    loss is ~0."""
    N, T = 3, 8
    bins = np.broadcast_to(np.linspace(0, 1, T + 1), (N, T + 1)).astype(np.float32)
    w = np.full((N, T), 1.0 / T, np.float32)
    got = float(proposal_loss([jnp.asarray(bins), jnp.asarray(bins)], [jnp.asarray(w), jnp.asarray(w)]))
    assert got < 1e-8


def test_entropy_loss():
    assert float(entropy_loss(jnp.asarray([0.5, 0.5]))) > 0.99
    assert float(entropy_loss(jnp.asarray([1e-6, 1.0 - 1e-6]))) < 0.01


def test_trunc_exp_grad_clamped():
    g_small = float(jax.grad(lambda x: trunc_exp(x))(jnp.asarray(1.0)))
    np.testing.assert_allclose(g_small, np.exp(1.0), rtol=1e-5)
    g_big = float(jax.grad(lambda x: trunc_exp(x))(jnp.asarray(20.0)))
    np.testing.assert_allclose(g_big, np.exp(15.0), rtol=1e-5)  # clamp at 15
    assert np.isfinite(float(trunc_exp(jnp.asarray(20.0))))


def test_label_regularization_smooth_is_smaller(rng):
    P, I = 4, 3
    depth = jnp.asarray(rng.uniform(1, 2, (2 * P * P,)).astype(np.float32))
    smooth = jnp.ones((2 * P * P, I))
    rough = jnp.asarray(rng.standard_normal((2 * P * P, I)).astype(np.float32))
    l_s = float(label_regularization(depth, smooth, P, I))
    l_r = float(label_regularization(depth, rough, P, I))
    assert l_s < 1e-8 < l_r


def test_rgb_similarity_loss_agreement_lower(rng):
    """Similar-RGB pixels with identical masks score lower than with
    conflicting masks."""
    S, P, I = 2, 16, 3
    key = jax.random.key(0)
    rgb = jnp.asarray(np.full((S, P, 3), 0.5, np.float32))  # all similar
    incoh = jnp.zeros((S, P))
    agree = np.zeros((S, P, I), np.float32)
    agree[..., 0] = 1.0
    conflict = np.zeros((S, P, I), np.float32)
    conflict[:, : P // 2, 0] = 1.0
    conflict[:, P // 2 :, 1] = 1.0
    l_agree = float(rgb_similarity_loss(key, rgb, jnp.asarray(agree), incoh))
    l_conf = float(rgb_similarity_loss(key, rgb, jnp.asarray(conflict), incoh))
    assert l_agree < l_conf


def test_label_regularization_degenerate_patch_finite(rng):
    """patch_size=1 has no in-patch neighbors: the diff axes are empty and
    the regularizer must be 0.0, not 0/0=nan (the nan carried zero
    gradient but poisoned every logged total loss that included it)."""
    n = 64
    depth = jnp.asarray(rng.uniform(1, 3, (n,)).astype(np.float32))
    masks = jnp.asarray(rng.uniform(0, 1, (n, 4)).astype(np.float32))
    val = float(label_regularization(depth, masks, 1, 4))
    assert np.isfinite(val) and val == 0.0
