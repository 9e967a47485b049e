"""CP-factorized line grid: the TPU-native high-capacity field encoder.

Motivation (measured, README "Field-family quality gate"): the reference's
hash grid beats the Fourier-feature MLP by ~4.6 dB on high-frequency
content, but hash-table gathers serialize on TPU (~10-100 M rows/s,
tools/probe_gather.py) — the representation is right, the memory access
is wrong for this hardware. A CP (CANDECOMP/PARAFAC) tensor factorization
(TensoRF's CP mode, arXiv:2203.09517) stores three 1-D LINES of features
per rank and reconstructs a volumetric feature as their product:

    feat_k(x, y, z) = Lx[u(x), k] * Ly[u(y), k] * Lz[u(z), k]

Linear interpolation along a line is a 2-nonzero one-hot MATMUL —
`W[B, R] @ L[R, K]` with `W` built from an iota comparison — which runs on
the MXU at full tilt instead of serializing through a gather unit. That is
the whole trick: grid capacity with matmul memory access.

Cost: 3 * R * K MACs/point (R=256, K=64 -> 49k, ~half the width-128 field
chain), fully fused by XLA on the training path. The inference fast path
(transposed Pallas kernels) gains the same dot as a [K, R] @ [R, B]
stationary-weight matmul — wired in a follow-up; until then CP-augmented
models render through the XLA path.

Backward: d/dL is the transposed one-hot matmul (again MXU); d/dx flows
through the interpolation weights (piecewise-linear, exact subgradient) —
both come free from autodiff of this formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_lines(key: jax.Array, res: int, rank: int,
               scale: float = 0.2) -> jax.Array:
    """[3, R, K] line tables, TensoRF-style scaled-normal init. With three
    factors multiplied, per-feature magnitude starts ~scale^3; the field
    MLP's first layer learns the gain."""
    return scale * jax.random.normal(key, (3, res, rank), jnp.float32)


def level_resolutions(res: int, levels: int, min_res: int = 16):
    """Coarse-to-fine geometric ladder ending at `res` (the hash grid's
    multiresolution structure, gridencoder.cu:82-110, applied to lines):
    levels=4, res=512 -> (64, 128, 256, 512)."""
    return tuple(max(min_res, res >> (levels - 1 - i)) for i in range(levels))


def init_lines_multi(key: jax.Array, res: int, rank: int, levels: int,
                     scale: float = 0.2):
    """List of per-level [3, R_i, K/levels] tables (coarse -> fine). The
    total feature count stays `rank` so a multi-res swap is capacity-
    comparable with a single-level grid of the same rank."""
    assert rank % levels == 0, (rank, levels)
    keys = jax.random.split(key, levels)
    return [init_lines(k, r, rank // levels, scale)
            for k, r in zip(keys, level_resolutions(res, levels))]


def line_features(lines: jax.Array, x: jax.Array, bound: float) -> jax.Array:
    """CP feature reconstruction at points x.

    lines: [3, R, K]; x: [N, 3] in [-bound, bound] (contracted domain).
    Returns [N, K] product features. All compute is iota-compare +
    matmul — no gathers.
    """
    R = lines.shape[1]
    # map to continuous grid coords [0, R-1]
    u = (x / bound * 0.5 + 0.5) * (R - 1)
    u = jnp.clip(u, 0.0, R - 1)
    i0 = jnp.floor(u)
    f = (u - i0).astype(lines.dtype)
    i0 = i0.astype(jnp.int32)
    iota = jnp.arange(R, dtype=jnp.int32)[None, :]  # [1, R]
    feat = None
    for a in range(3):
        hit0 = (iota == i0[:, a : a + 1]).astype(lines.dtype)
        hit1 = (iota == i0[:, a : a + 1] + 1).astype(lines.dtype)
        W = hit0 * (1.0 - f[:, a : a + 1]) + hit1 * f[:, a : a + 1]  # [N, R]
        fa = jnp.dot(W, lines[a], preferred_element_type=jnp.float32)
        feat = fa if feat is None else feat * fa
    return feat


def line_features_gather(lines: jax.Array, x: jax.Array,
                         bound: float) -> jax.Array:
    """Gather-based CP lookup — the TRAINING/XLA-path twin of
    :func:`line_features` (bit-identical math; 6 row gathers per point
    instead of ``3 * R * K`` MACs). The one-hot contraction is the right
    form INSIDE the fused inference kernels where the lines live in VMEM
    and gathers don't exist (ops/fused_mlp_t._cp_block); on the XLA path
    gathers win as soon as R*K outgrows a few thousand MACs/point —
    which every capacity-relevant configuration does."""
    R = lines.shape[1]
    u = jnp.clip((x / bound * 0.5 + 0.5) * (R - 1), 0.0, R - 1)
    i0 = jnp.floor(u).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, R - 1)
    f = (u - jnp.floor(u)).astype(jnp.float32)
    feat = None
    for a in range(3):
        v0 = jnp.take(lines[a], i0[:, a], axis=0).astype(jnp.float32)
        v1 = jnp.take(lines[a], i1[:, a], axis=0).astype(jnp.float32)
        fa = v0 * (1.0 - f[:, a : a + 1]) + v1 * f[:, a : a + 1]
        feat = fa if feat is None else feat * fa
    return feat


def line_features_ref(lines: jax.Array, x: jax.Array,
                      bound: float) -> jax.Array:
    """Gather-based reference implementation (oracle for tests)."""
    R = lines.shape[1]
    u = jnp.clip((x / bound * 0.5 + 0.5) * (R - 1), 0.0, R - 1)
    i0 = jnp.floor(u).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, R - 1)
    f = u - i0
    feat = None
    for a in range(3):
        v0 = jnp.take(lines[a], i0[:, a], axis=0)
        v1 = jnp.take(lines[a], i1[:, a], axis=0)
        fa = v0 * (1.0 - f[:, a : a + 1]) + v1 * f[:, a : a + 1]
        feat = fa if feat is None else feat * fa
    return feat


def line_features_multi(lines_list, x: jax.Array, bound: float,
                        level_weights=None, lookup: str = "onehot") -> jax.Array:
    """Concatenated per-level CP features (coarse -> fine), [N, sum K_i].
    `level_weights` ([L] scalars, optional) gates levels coarse-to-fine
    during annealed training (see anneal_level_weights); None = all on.
    `lookup` picks the per-level primitive ("onehot" | "gather")."""
    fn = line_features_gather if lookup == "gather" else line_features
    feats = [fn(l, x, bound) for l in lines_list]
    if level_weights is not None:
        feats = [f * level_weights[i] for i, f in enumerate(feats)]
    return jnp.concatenate(feats, axis=-1)


def anneal_level_weights(alpha: jax.Array, levels: int) -> jax.Array:
    """Cosine easing window over resolution levels (the grid analogue of
    BARF's PE-band window, cf. Nerfies arXiv:2011.12948 §C): level i opens
    as alpha*levels sweeps past i; exactly all-ones at alpha=1. Level 0
    (coarsest) is always fully open so the density field can form."""
    i = jnp.arange(levels, dtype=jnp.float32)
    t = jnp.clip(alpha * levels - i, 0.0, 1.0)
    w = 0.5 * (1.0 - jnp.cos(jnp.pi * t))
    return w.at[0].set(1.0)


def linresize(t: jax.Array, new_res: int, axis: int = 1) -> jax.Array:
    """Linear resample of a table along `axis` to `new_res`, preserving the
    represented function under this module's align-corners convention
    (lookup maps [-bound, bound] onto [0, R-1], vmgrid._interp_weights):
    new[j] samples the old table at u = j * (R-1) / (new_res-1). This is
    TensoRF's `upsample_volume_grid` step — grids train coarse-to-fine and
    bilinear-upsample at milestone steps (their §5.2 'coarse-to-fine
    reconstruction'; runs between epochs on the host path, so the gather
    form is fine)."""
    R = t.shape[axis]
    if new_res == R:
        return t
    u = jnp.linspace(0.0, R - 1.0, new_res)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, max(R - 2, 0))
    f = u - i0
    a = jnp.take(t, i0, axis=axis)
    b = jnp.take(t, jnp.minimum(i0 + 1, R - 1), axis=axis)
    shape = [1] * t.ndim
    shape[axis] = new_res
    f = f.reshape(shape)
    return a * (1.0 - f) + b * f


def grad_total_variation(lines: jax.Array, weight: float) -> jax.Array:
    """Gradient of the 1-D total-variation penalty weight * sum_i
    (L[i+1] - L[i])^2 over every line/rank — TensoRF's TV term, the
    classic floater control for factorized grids. Returned as a gradient
    CONTRIBUTION (matching hashgrid.grad_total_variation's contract) so
    the train step adds it to the autodiff grads without a second
    backward pass: d/dL[i] = 2w * ((L[i] - L[i-1]) + (L[i] - L[i+1]))."""
    d = lines[:, 1:, :] - lines[:, :-1, :]  # [3, R-1, K]
    g = jnp.zeros_like(lines)
    g = g.at[:, 1:, :].add(2.0 * weight * d)
    g = g.at[:, :-1, :].add(-2.0 * weight * d)
    return g
