"""Rendering regularizers and mask-training losses.

- `distort_loss`: mip-NeRF-360 distortion. The reference depends on the CUDA
  package `torch_efficient_distloss.eff_distloss` (renderer.py:14-27); here
  it is the O(T) prefix-sum identity in plain jnp — XLA fuses it.
- `proposal_loss`: interlevel bound loss (renderer.py:30-57).
- `entropy_loss`: weights-sum entropy (utils.py:927-930).
- mask losses: rgb-similarity (utils.py:761-841) and depth-weighted label
  regularization (utils.py:843-870) live here as pure functions.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from sanerf_tpu.ops.sampling import searchsorted_right, take_by_index_dense


def distort_loss(bins: jax.Array, weights: jax.Array) -> jax.Array:
    """Distortion loss over one ray batch (renderer.py:17-27).

    loss = mean_n [ sum_{i,j} w_i w_j |m_i - m_j| + (1/3) sum_i w_i^2 d_i ]

    The pairwise term uses the exclusive-prefix-sum identity
    sum_{i,j} w_i w_j |m_i - m_j| = 2 sum_i w_i (m_i W_{<i} - (wm)_{<i}),
    matching the CUDA/CUB segmented implementation of
    `torch_efficient_distloss.eff_distloss` in O(T).

    bins: [N, T+1] (s-space edges), weights: [N, T].
    """
    intervals = bins[..., 1:] - bins[..., :-1]
    mids = bins[..., :-1] + intervals / 2.0

    wm = weights * mids
    w_cum = jnp.cumsum(weights, axis=-1) - weights  # exclusive prefix
    wm_cum = jnp.cumsum(wm, axis=-1) - wm
    loss_bi = 2.0 * jnp.sum(weights * (mids * w_cum - wm_cum), axis=-1)
    loss_uni = (1.0 / 3.0) * jnp.sum(weights * weights * intervals, axis=-1)
    return jnp.mean(loss_bi + loss_uni)


def _loss_interlevel(
    t0: jax.Array, w0: jax.Array, t1: jax.Array, w1: jax.Array
) -> jax.Array:
    """Histogram bound loss of one proposal level vs the (detached) final
    level (renderer.py:35-49). t0/w0 are the final NeRF level, t1/w1 the
    proposal level being penalized."""
    cw1 = jnp.concatenate(
        [jnp.zeros_like(w1[..., :1]), jnp.cumsum(w1, axis=-1)], axis=-1
    )  # [N, T1+1]
    T1 = w1.shape[-1]
    inds_lo = jnp.clip(searchsorted_right(t1[..., :-1], t0[..., :-1]) - 1, 0, T1 - 1)
    inds_hi = jnp.clip(searchsorted_right(t1[..., 1:], t0[..., 1:]), 0, T1 - 1)

    # gather-free selection (take_by_index_dense docstring explains why)
    cw1_lo = take_by_index_dense(cw1[..., :-1], inds_lo)
    cw1_hi = take_by_index_dense(cw1[..., 1:], inds_hi)
    w = cw1_hi - cw1_lo
    return jnp.maximum(w0 - w, 0.0) ** 2 / (w0 + 1e-8)


def proposal_loss(
    all_bins: Sequence[jax.Array], all_weights: Sequence[jax.Array]
) -> jax.Array:
    """Sum of interlevel losses of every proposal level against the final
    level (renderer.py:51-57). The final level's histogram is detached."""
    bins_ref = jax.lax.stop_gradient(all_bins[-1])
    weights_ref = jax.lax.stop_gradient(all_weights[-1])
    loss = 0.0
    for bins, weights in zip(all_bins[:-1], all_weights[:-1]):
        loss = loss + jnp.mean(_loss_interlevel(bins_ref, weights_ref, bins, weights))
    return loss


def entropy_loss(weights_sum: jax.Array) -> jax.Array:
    """Binary entropy of per-ray opacity (utils.py:927-930)."""
    w = jnp.clip(weights_sum, 1e-5, 1.0 - 1e-5)
    entropy = -w * jnp.log2(w) - (1.0 - w) * jnp.log2(1.0 - w)
    return jnp.mean(entropy)


def label_regularization(
    depth: jax.Array, pred_masks: jax.Array, patch_size: int, n_inst: int,
    axis_name=None,
) -> jax.Array:
    """Depth-weighted spatial smoothness of mask logits over square patches
    (utils.py:843-870).

    depth: [B*P*P] (or any shape reshapeable to patches), pred_masks:
    [..., n_inst] over the same pixels. With `axis_name` (inside shard_map)
    the weighted sums psum over the mesh so the sharded loss equals the
    single-device value exactly.
    """
    pm = pred_masks.reshape(-1, patch_size, patch_size, n_inst)
    pm = jnp.transpose(pm, (0, 3, 1, 2))  # [B, I, P, P]
    diff_x = pm[:, :, :, 1:] - pm[:, :, :, :-1]
    diff_y = pm[:, :, 1:, :] - pm[:, :, :-1, :]

    d = depth.reshape(-1, patch_size, patch_size)
    ddx = d[:, :, 1:] - d[:, :, :-1]
    ddy = d[:, 1:, :] - d[:, :-1, :]
    wx = jnp.exp(-(ddx * ddx))[:, None, :, :]
    wy = jnp.exp(-(ddy * ddy))[:, None, :, :]
    wx = jnp.broadcast_to(wx, diff_x.shape)
    wy = jnp.broadcast_to(wy, diff_y.shape)

    nx, dx_ = jnp.sum(diff_x * diff_x * wx), jnp.sum(wx)
    ny, dy_ = jnp.sum(diff_y * diff_y * wy), jnp.sum(wy)
    if axis_name is not None:
        nx, dx_, ny, dy_ = (jax.lax.psum(v, axis_name)
                            for v in (nx, dx_, ny, dy_))
    # patch_size < 2 makes the diff axes empty -> 0/0; the regularizer is
    # then vacuous (no in-patch neighbors), not infinite — return 0, and
    # keep the value finite so a logged total loss stays meaningful (the
    # nan carried ZERO gradient — empty reductions — so it only poisoned
    # the report)
    return nx / jnp.maximum(dx_, 1e-12) + ny / jnp.maximum(dy_, 1e-12)


def rgb_similarity_loss(
    key: jax.Array,
    rgb: jax.Array,
    inst_masks: jax.Array,
    incoherent: jax.Array,
    *,
    threshold: float = 0.3,
    exp_weight: float = 10.0,
    epsilon: float = 1e-6,
    num_sample: int = 1,
    redundant_instance: int = 0,
    use_pred_logistics: bool = False,
) -> jax.Array:
    """Within-patch mask-agreement loss for RGB-similar pixels
    (utils.py:761-841).

    Args:
      rgb: [S, P, 3] local patch colors (S patches of P pixels).
      inst_masks: [S, P, I] per-pixel softmax mask probabilities.
      incoherent: [S, P] incoherence / error weights in [0, 1].

    Per patch, sample `num_sample` anchor pixels from the coherent region
    (falling back to uniform when no pixel qualifies), then for every pixel
    whose RGB distance to the anchor is under `threshold`, penalize mask
    disagreement via exp(-k * cos_sim).
    """
    S, P, _ = rgb.shape
    weights = 1.0 - incoherent.astype(jnp.float32)
    weights = (weights > 0.8).astype(jnp.float32)  # utils.py:779-780
    invalid = jnp.sum(weights, axis=-1) == 0
    weights = jnp.where(invalid[:, None], jnp.ones_like(weights), weights)

    # categorical sampling without replacement via Gumbel top-k
    g = jax.random.gumbel(key, (S, P))
    scores = jnp.where(weights > 0, g, -jnp.inf)
    _, sample_index = jax.lax.top_k(scores, num_sample)  # [S, K]

    take = lambda a: jnp.take_along_axis(a, sample_index[..., None], axis=1)
    rgb_sample = take(rgb)[:, :, None, :]  # [S, K, 1, 3]
    sample_mask = jax.lax.stop_gradient(take(inst_masks))[:, :, None, :]  # [S, K, 1, I]
    if not use_pred_logistics:
        arg = jnp.argmax(sample_mask, axis=-1)
        sample_mask = jax.nn.one_hot(arg, inst_masks.shape[-1], dtype=inst_masks.dtype)

    rgb_b = rgb[:, None, :, :]  # [S, 1, P, 3]
    masks_b = inst_masks[:, None, :, :]  # [S, 1, P, I]

    color_dist = jnp.linalg.norm(rgb_b - rgb_sample, axis=-1)  # [S, K, P]
    similar = color_dist < threshold

    def _cos(a, b):
        num = jnp.sum(a * b, axis=-1)
        den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
        return num / jnp.maximum(den, 1e-8)

    cos_sim = _cos(masks_b, sample_mask)  # [S, K, P]
    penalty = jnp.exp(-exp_weight * cos_sim - epsilon)

    if redundant_instance > 0:
        labels = 1.0 - similar.astype(jnp.float32)
        p = jnp.clip(penalty, epsilon, 1.0 - epsilon)
        bce = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
        return jnp.mean(bce)
    num = jnp.sum(similar * penalty, axis=-1)
    den = jnp.maximum(jnp.sum(similar, axis=-1), 1)
    return jnp.mean(num / den)
