"""VM (vector-matrix) factorized grid: TensoRF's high-capacity mode,
mapped to the MXU.

The CP line grid (ops/cpgrid.py) buys grid capacity with matmul-only
memory access, but its rank-1 axis-aligned structure underfits
non-axis-aligned detail (TensoRF, arXiv:2203.09517 §4: VM beats CP by
~2-3 dB at matched budget). VM stores, per mode m, a 2-D feature PLANE
over the other two axes and a 1-D line along m:

    feat_m,k(x) = P_m[u(x_a), u(x_b), k] * L_m[u(x_m), k],   (a, b) = axes != m

and concatenates the three modes. On TPU the bilinear plane lookup is
two contractions, neither of which is a gather:

  1. rows:  ``Wa[B, R] @ P_m[R, R*K]``  — a 2-nonzero one-hot matmul on
     the MXU (same trick as cpgrid.line_features);
  2. cols:  ``sum_r Wb[B, r] * mid[B, r, K]`` — a per-sample weighted
     reduction, pure VPU elementwise+sum at B*R*K ops (no MXU needed:
     the contraction is batched over B, which dot_general would
     serialize into B tiny dots).

Cost per point per mode: R*(R*K) MXU MACs for step 1 (R=64, K=16 ->
65k), so VM is a TRAINING-PATH capacity tool at moderate plane res; the
inference fast path keeps rendering VM models through the XLA path
(renderer.py's `fast` predicate excludes them) until the kernels learn
the two-step contraction.

Backward comes free from autodiff: d/dP is the transposed one-hot
matmul, d/dx flows through the interpolation weights.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sanerf_tpu.ops import cpgrid


def init_vm(key: jax.Array, res: int, rank: int, line_res: int | None = None,
            scale: float = 0.2) -> Tuple[jax.Array, jax.Array]:
    """([3, R, R, K] planes, [3, Rl, K] lines), TensoRF-style scaled-normal
    init. Plane*line products start ~scale^2 per feature; the field MLP's
    first layer learns the gain."""
    if line_res is None:
        line_res = res
    kp, kl = jax.random.split(key)
    planes = scale * jax.random.normal(kp, (3, res, res, rank), jnp.float32)
    lines = scale * jax.random.normal(kl, (3, line_res, rank), jnp.float32)
    return planes, lines


def init_vm_multi(key: jax.Array, res: int, rank: int, levels: int,
                  scale: float = 0.2):
    """Coarse-to-fine VM ladder: rank splits across a geometric resolution
    ladder ending at `res` (cpgrid.level_resolutions — the hash grid's
    multiresolution structure applied to planes). Returns (planes_list,
    lines_list), each a list of per-level tables coarse -> fine; total
    feature count stays 3 * rank, so a multi-res swap is capacity-
    comparable with a single-level grid of the same rank."""
    assert rank % levels == 0, (rank, levels)
    keys = jax.random.split(key, levels)
    pairs = [init_vm(k, r, rank // levels, scale=scale)
             for k, r in zip(keys, cpgrid.level_resolutions(res, levels))]
    return [p for p, _ in pairs], [l for _, l in pairs]


def resize_vm(planes: jax.Array, lines: jax.Array,
              new_res: int) -> Tuple[jax.Array, jax.Array]:
    """Bilinear-resample a VM level to plane resolution `new_res`
    (separable 1-D passes; TensoRF's upsample_volume_grid). The line
    resolution scales by the same factor, preserving any line_res
    decoupling."""
    old = planes.shape[1]
    p = cpgrid.linresize(cpgrid.linresize(planes, new_res, axis=1),
                         new_res, axis=2)
    new_line = max(2, int(round(lines.shape[1] * new_res / old)))
    return p, cpgrid.linresize(lines, new_line, axis=1)


def vm_features_multi(planes_list, lines_list, x: jax.Array, bound: float,
                      level_weights=None, lookup: str = "gather") -> jax.Array:
    """Concatenated per-level VM features (coarse -> fine),
    [N, 3 * sum K_i]. `level_weights` ([L] scalars, optional) gates levels
    coarse-to-fine during annealed training (cpgrid.anneal_level_weights);
    None = all on. `lookup` picks the per-level primitive."""
    fn = vm_features_gather if lookup == "gather" else vm_features
    feats = [fn(p, l, x, bound) for p, l in zip(planes_list, lines_list)]
    if level_weights is not None:
        feats = [f * level_weights[i] for i, f in enumerate(feats)]
    return jnp.concatenate(feats, axis=-1)


def _interp_weights(x: jax.Array, bound: float, R: int):
    """[N, 3] points -> ([N, 3] floor idx, [N, 3] frac, [1, R] iota)."""
    u = jnp.clip((x / bound * 0.5 + 0.5) * (R - 1), 0.0, R - 1)
    i0 = jnp.floor(u)
    f = u - i0
    return i0.astype(jnp.int32), f, jnp.arange(R, dtype=jnp.int32)[None, :]


def _onehot(i0: jax.Array, f: jax.Array, iota: jax.Array,
            axis: int, dtype) -> jax.Array:
    """2-nonzero linear-interp row weights for axis `axis`: [N, R]."""
    hit0 = (iota == i0[:, axis : axis + 1]).astype(dtype)
    hit1 = (iota == i0[:, axis : axis + 1] + 1).astype(dtype)
    return hit0 * (1.0 - f[:, axis : axis + 1].astype(dtype)) \
        + hit1 * f[:, axis : axis + 1].astype(dtype)


def vm_features(planes: jax.Array, lines: jax.Array, x: jax.Array,
                bound: float) -> jax.Array:
    """VM feature reconstruction at points x.

    planes: [3, R, R, K] (mode m spans axes ((m+1)%3, (m+2)%3), row axis
    first); lines: [3, Rl, K]; x: [N, 3] in [-bound, bound]. Returns
    [N, 3*K] concatenated mode features. Iota-compare + matmul + VPU
    reduction — no gathers.
    """
    _, R, _, K = planes.shape
    Rl = lines.shape[1]
    dt = planes.dtype
    i0p, fp, iop = _interp_weights(x, bound, R)
    i0l, fl, iol = _interp_weights(x, bound, Rl)
    feats = []
    for m in range(3):
        a, b = (m + 1) % 3, (m + 2) % 3
        Wa = _onehot(i0p, fp, iop, a, dt)                      # [N, R]
        Wb = _onehot(i0p, fp, iop, b, dt)                      # [N, R]
        mid = jnp.dot(Wa, planes[m].reshape(R, R * K),
                      preferred_element_type=jnp.float32)      # [N, R*K] MXU
        pf = jnp.sum(Wb[:, :, None] * mid.reshape(-1, R, K), axis=1)  # VPU
        lf = jnp.dot(_onehot(i0l, fl, iol, m, dt), lines[m],
                     preferred_element_type=jnp.float32)       # [N, K] MXU
        feats.append(pf * lf)
    return jnp.concatenate(feats, axis=-1)


def vm_features_gather(planes: jax.Array, lines: jax.Array, x: jax.Array,
                       bound: float) -> jax.Array:
    """Gather-based VM lookup — the high-capacity TRAINING/XLA path.

    Mathematically identical to :func:`vm_features`, but row-gathers the 4
    bilinear corners from the flattened ``[R*R, K]`` plane instead of
    building one-hot contractions, so per-point cost is 12 row gathers +
    O(K) VPU math instead of ``3 * R * (R*K)`` MACs. At TensoRF scale
    (R=256, K=32 — the capacity regime that actually matches the
    reference's hash grid, arXiv:2203.09517 Tab. 1) the one-hot
    contraction is ~2M MACs/point and simply not viable; TPU row gathers
    run at ~10-100M rows/s (tools/probe_gather.py) and need only 12/point
    here vs the hash grid's ``8 * levels = 128``. Backward is the
    transposed scatter-add (deterministic on TPU, XLA sorts duplicates).
    """
    _, R, _, K = planes.shape
    Rl = lines.shape[1]
    i0p, fp, _ = _interp_weights(x, bound, R)
    i1p = jnp.minimum(i0p + 1, R - 1)
    i0l, fl, _ = _interp_weights(x, bound, Rl)
    i1l = jnp.minimum(i0l + 1, Rl - 1)
    fp = fp.astype(jnp.float32)
    fl = fl.astype(jnp.float32)
    feats = []
    for m in range(3):
        a, b = (m + 1) % 3, (m + 2) % 3
        P = planes[m].reshape(R * R, K)
        # flattened row ids -> ONE 1-D row gather per corner (XLA lowers
        # multi-axis fancy indexing to a composite gather; this form stays
        # a single contiguous-row gather)
        r0, r1 = i0p[:, a] * R, i1p[:, a] * R
        v00 = jnp.take(P, r0 + i0p[:, b], axis=0).astype(jnp.float32)
        v01 = jnp.take(P, r0 + i1p[:, b], axis=0).astype(jnp.float32)
        v10 = jnp.take(P, r1 + i0p[:, b], axis=0).astype(jnp.float32)
        v11 = jnp.take(P, r1 + i1p[:, b], axis=0).astype(jnp.float32)
        fa = fp[:, a : a + 1]
        fb = fp[:, b : b + 1]
        pf = ((v00 * (1 - fb) + v01 * fb) * (1 - fa)
              + (v10 * (1 - fb) + v11 * fb) * fa)
        l0 = jnp.take(lines[m], i0l[:, m], axis=0).astype(jnp.float32)
        l1 = jnp.take(lines[m], i1l[:, m], axis=0).astype(jnp.float32)
        lf = l0 * (1 - fl[:, m : m + 1]) + l1 * fl[:, m : m + 1]
        feats.append(pf * lf)
    return jnp.concatenate(feats, axis=-1)


def vm_features_ref(planes: jax.Array, lines: jax.Array, x: jax.Array,
                    bound: float) -> jax.Array:
    """Gather-based bilinear reference implementation (oracle for tests)."""
    _, R, _, K = planes.shape
    Rl = lines.shape[1]
    i0p, fp, _ = _interp_weights(x, bound, R)
    i1p = jnp.minimum(i0p + 1, R - 1)
    i0l, fl, _ = _interp_weights(x, bound, Rl)
    i1l = jnp.minimum(i0l + 1, Rl - 1)
    feats = []
    for m in range(3):
        a, b = (m + 1) % 3, (m + 2) % 3
        P = planes[m]
        v00 = P[i0p[:, a], i0p[:, b]]
        v01 = P[i0p[:, a], i1p[:, b]]
        v10 = P[i1p[:, a], i0p[:, b]]
        v11 = P[i1p[:, a], i1p[:, b]]
        fa = fp[:, a : a + 1]
        fb = fp[:, b : b + 1]
        pf = ((v00 * (1 - fb) + v01 * fb) * (1 - fa)
              + (v10 * (1 - fb) + v11 * fb) * fa)
        l0 = jnp.take(lines[m], i0l[:, m], axis=0)
        l1 = jnp.take(lines[m], i1l[:, m], axis=0)
        lf = l0 * (1 - fl[:, m : m + 1]) + l1 * fl[:, m : m + 1]
        feats.append(pf * lf)
    return jnp.concatenate(feats, axis=-1)


def grad_total_variation_planes(planes: jax.Array,
                                weight: float) -> jax.Array:
    """Gradient CONTRIBUTION of weight * sum (P[i+1,j]-P[i,j])^2 +
    (P[i,j+1]-P[i,j])^2 over every plane/rank (2-D TV, TensoRF's floater
    control; same contract as cpgrid.grad_total_variation)."""
    g = jnp.zeros_like(planes)
    dr = planes[:, 1:, :, :] - planes[:, :-1, :, :]
    g = g.at[:, 1:, :, :].add(2.0 * weight * dr)
    g = g.at[:, :-1, :, :].add(-2.0 * weight * dr)
    dc = planes[:, :, 1:, :] - planes[:, :, :-1, :]
    g = g.at[:, :, 1:, :].add(2.0 * weight * dc)
    g = g.at[:, :, :-1, :].add(-2.0 * weight * dc)
    return g
