"""Import-time distillation: hash-grid checkpoints -> the TPU-flagship MLP
field family.

Why this exists. The reference's field is an instant-ngp multiresolution
hash grid (network.py:102, gridencoder/src/gridencoder.cu:82-201) whose
inference cost on TPU is dominated by per-point table gathers — an
operation TPUs fundamentally serialize (no per-lane dynamic addressing;
measured ~10-100 M rows/s for every gather formulation, vs the ~1.6e9
lookups a single 512^2 frame needs). No kernel closes that gap; the
hardware-native answer is to convert the *representation* once at import:
fit the flagship Fourier-feature MLP field to the converted hash-grid
field, then render through the fused Pallas inference path at full speed.

The conversion is small because the two families share every head that
has identical structure (same param-tree names, same shapes):
  - view_mlp, samvit_mlp + samvit_norm, mask_mlp  -> copied verbatim
  - grid encode+MLP, prop nets, s_grid, m_grid    -> distilled
Only position-conditioned functions are refit; everything downstream of
the per-point features is exact.

Typical use (after models/convert_nerf.py):
    teacher_params = convert_nerf_checkpoint("ngp.pth", teacher_model)
    student_model, student_params, report = distill_to_mlp(
        teacher_model, teacher_params, key=jax.random.key(0))

`report["render_psnr"]` is the fidelity of the imported field measured on
rendered frames (student vs teacher), which is the quantity a user of the
converted checkpoint actually cares about.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.config import ModelConfig
from sanerf_tpu.models import fields
from sanerf_tpu.models.fields import NerfModel, Params
from sanerf_tpu.ops import hashgrid
from sanerf_tpu.ops.freq import freq_encode

# the two families use different density activations (teacher: trunc_exp,
# student: shifted softplus — fields.density_activation), so density is
# matched in log1p(sigma) space, order-preserving and smooth for both.
# The teacher's sigma is capped: exp(12)≈1.6e5 already saturates alpha at
# any realistic step size, and softplus cannot (and needs not) express
# astronomically dense points
_SIGMA_CAP = float(np.exp(12.0))
_LOGIT_CLIP = 30.0  # pre-activation guard against exp overflow


def student_config(teacher_cfg: ModelConfig, cp_rank: int = 0,
                   cp_res: int = 256, cp_levels: int = 1, vm_rank: int = 0,
                   vm_res: int = 64, vm_levels: int = 1,
                   sigma_cp_rank: int = 0, sigma_cp_res: int = 256,
                   sigma_vm_rank: int = 0, sigma_vm_res: int = 128,
                   depth: Optional[int] = None,
                   width: Optional[int] = None,
                   prop_width: Optional[int] = None,
                   prop_depth: Optional[int] = None) -> ModelConfig:
    """The MLP-family twin of a hash-grid config: same heads, same feature
    dims, field_type flipped. `cp_rank > 0` gives the student a
    CP-factorized line grid (ops/cpgrid.py), `vm_rank > 0` a TensoRF-VM
    plane grid (ops/vmgrid.py), `sigma_*_rank > 0` dedicated DIRECT-density
    tables — all matmul-only lookups, all consumed in-kernel by the fused
    inference path under cp_fused (multi-level ladders included). `depth`
    overrides mlp_field_depth: the measured-best grid student is a SHALLOW
    decoder (depth 3) over high-resolution ladders. `width` slims the field
    MLP (the MXU cost of the fused chain scales ~linearly in width);
    `prop_width`/`prop_depth` slim the served proposal net — its [64, 48]
    dots run at <20% MXU tile utilization, so a depth-2 prop cuts real
    milliseconds at matched sample placement."""

    def _extras(cfg):
        if depth is not None:
            cfg = dataclasses.replace(cfg, mlp_field_depth=depth)
        if width is not None:
            cfg = dataclasses.replace(cfg, mlp_field_width=width)
        if prop_width is not None:
            cfg = dataclasses.replace(cfg, mlp_prop_width=prop_width)
        if prop_depth is not None:
            cfg = dataclasses.replace(cfg, mlp_prop_depth=prop_depth)
        return cfg

    if teacher_cfg.field_type == "mlp":
        # MLP-family (grid-augmented) teacher: keep its head feature dims
        # verbatim (same-family serving distillation) and swap the tables
        cfg = dataclasses.replace(
            teacher_cfg,
            mlp_cp_rank=cp_rank, mlp_cp_res=cp_res, mlp_cp_levels=cp_levels,
            mlp_vm_rank=vm_rank, mlp_vm_res=vm_res, mlp_vm_levels=vm_levels,
            mlp_sigma_cp_rank=sigma_cp_rank, mlp_sigma_cp_res=sigma_cp_res,
            mlp_sigma_vm_rank=sigma_vm_rank, mlp_sigma_vm_res=sigma_vm_res)
        return _extras(cfg)
    # mask-feature width tracks the teacher's m_grid output
    # (fields.make_model: default 16x8, lightweight 16x2)
    mask_dim = {"default": 128, "lightweight_mask": 32}.get(
        teacher_cfg.mask_mlp_type, teacher_cfg.mlp_mask_feat_dim)
    cfg = dataclasses.replace(
        teacher_cfg,
        field_type="mlp",
        mlp_cp_rank=cp_rank,
        mlp_cp_res=cp_res,
        mlp_cp_levels=cp_levels,
        mlp_vm_rank=vm_rank,
        mlp_vm_res=vm_res,
        mlp_vm_levels=vm_levels,
        mlp_sigma_cp_rank=sigma_cp_rank,
        mlp_sigma_cp_res=sigma_cp_res,
        mlp_sigma_vm_rank=sigma_vm_rank,
        mlp_sigma_vm_res=sigma_vm_res,
        mlp_sam_feat_dim=(teacher_cfg.s_grid_num_levels
                          * teacher_cfg.s_grid_level_dim),
        mlp_mask_feat_dim=mask_dim,
    )
    return _extras(cfg)


def _sample_points(key: jax.Array, n: int, bound: float) -> jax.Array:
    """Contracted-domain training points: half in the central unit region
    (where un-contracted scene content lives), the rest across the full
    contracted shell [-2, 2] and a near-origin gaussian."""
    k1, k2, k3 = jax.random.split(key, 3)
    n1, n2 = n // 2, n // 3
    n3 = n - n1 - n2
    a = jax.random.uniform(k1, (n1, 3), minval=-1.0, maxval=1.0)
    b = jax.random.uniform(k2, (n2, 3), minval=-bound, maxval=bound)
    c = jnp.clip(0.4 * jax.random.normal(k3, (n3, 3)), -bound, bound)
    return jnp.concatenate([a, b, c], axis=0)


def _teacher_field(model: NerfModel, params: Params, x: jax.Array) -> jax.Array:
    if model.is_mlp_field:
        # grid-augmented MLP-family teacher (serving distillation: fit the
        # hi-res quality recipe into a VMEM-sized serving student)
        return _student_field(model, params, x)
    h = hashgrid.hash_encode(x, params["grid"], model.grid_spec, model.bound)
    f, _ = fields.apply_mlp(params["grid_mlp"], h)
    return f  # [N, 1+geo] raw logits


def _teacher_prop(model: NerfModel, params: Params, i: int, x: jax.Array):
    if model.is_mlp_field:
        return _student_prop(model, params, i, x)
    p = params["prop"][i]
    h = hashgrid.hash_encode(x, p["grid"], model.prop_specs[i], model.bound)
    f, _ = fields.apply_mlp(p["mlp"], h)
    return f[..., :1]


def _student_field(model: NerfModel, params: Params, x: jax.Array) -> jax.Array:
    h = fields.position_features(model, params, x)
    f, _ = fields.apply_skip_mlp(
        params["grid_mlp"], h, (model.cfg.mlp_field_depth // 2,))
    sg = fields.sigma_grid_logit(model, params, x)
    if sg is not None:
        # DIRECT-density tables add into the logit exactly as inference
        # does (common_forward) — distill the same function that serves
        f = f.at[..., 0].add(sg.astype(f.dtype))
    return f


def _student_prop(model: NerfModel, params: Params, i: int, x: jax.Array):
    h = freq_encode(x * (jnp.pi / model.bound), model.cfg.mlp_prop_enc_freqs)
    f, _ = fields.apply_mlp(params["prop"][i]["mlp"], h)
    return f[..., :1]


def _log_density(f0: jax.Array, mlp_family: bool) -> jax.Array:
    """log1p(sigma) under the family's activation (fields.density_activation
    semantics), teacher capped at _SIGMA_CAP."""
    f0 = jnp.clip(f0, -_LOGIT_CLIP, _LOGIT_CLIP)
    if mlp_family:
        sigma = jax.nn.softplus(f0 - 1.0)  # no cap: keep gradient alive
    else:
        sigma = jnp.minimum(jnp.exp(f0), _SIGMA_CAP)
    return jnp.log1p(sigma)


def _match_loss(student: jax.Array, target: jax.Array,
                teacher_mlp: bool = False) -> jax.Array:
    """log-density + feature MSE; column 0 is the raw density logit
    (student: MLP family; target density decodes under the teacher's own
    activation — trunc-exp for hashgrid, shifted-softplus for MLP)."""
    l_sigma = jnp.mean(
        (_log_density(student[..., 0], True)
         - _log_density(target[..., 0], teacher_mlp)) ** 2)
    if student.shape[-1] > 1:
        l_feat = jnp.mean((student[..., 1:] - target[..., 1:]) ** 2)
    else:
        l_feat = 0.0
    return l_sigma + l_feat


def build_targets(
    teacher_model: NerfModel,
    teacher_params: Params,
    key: jax.Array,
    n_points: int,
    chunk: int = 1 << 18,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Evaluate the hash-grid teacher on a density-importance-resampled
    point set. Two passes: a uniform mixture, then jittered re-draws around
    the top-density third (surfaces are where field error shows up in
    renders)."""
    c = teacher_model.cfg
    kx, kj, kp = jax.random.split(key, 3)
    x = _sample_points(kx, n_points, teacher_model.bound)

    f_field = _eval_chunked(
        lambda tp, q: _teacher_field(teacher_model, tp, q),
        teacher_params, x, chunk)
    # importance pass: points near content get a jittered twin replacing
    # the emptiest third of the pool
    order = jnp.argsort(f_field[:, 0])
    n_rep = n_points // 3
    dense = x[order[-n_rep:]]
    jit_pts = jnp.clip(
        dense + 0.03 * jax.random.normal(kj, dense.shape),
        -teacher_model.bound, teacher_model.bound)
    x = x.at[order[:n_rep]].set(jit_pts)
    perm = jax.random.permutation(kp, n_points)
    x = x[perm]

    targets = {
        "field": _eval_chunked(
            lambda tp, q: _teacher_field(teacher_model, tp, q),
            teacher_params, x, chunk),
    }
    for i in range(len(c.prop_resolutions)):
        targets[f"prop{i}"] = _eval_chunked(
            lambda tp, q, i=i: _teacher_prop(teacher_model, tp, i, q),
            teacher_params, x, chunk)
    if c.with_sam and "s_grid" in teacher_params:
        targets["sam"] = _eval_chunked(
            lambda tp, q: hashgrid.hash_encode(
                q, tp["s_grid"], teacher_model.s_grid_spec,
                teacher_model.bound), teacher_params, x, chunk)
    elif c.with_sam and "s_field_mlp" in teacher_params:
        # MLP-family teacher: its per-point SAM features come from the
        # s_field_mlp over its (possibly grid-augmented) features
        targets["sam"] = _eval_chunked(
            lambda tp, q: fields.apply_mlp(
                tp["s_field_mlp"],
                fields.position_features(teacher_model, tp, q))[0],
            teacher_params, x, chunk)
    if c.with_mask and "m_grid" in teacher_params:
        targets["mask"] = _eval_chunked(
            lambda tp, q: hashgrid.hash_encode(
                q, tp["m_grid"], teacher_model.m_grid_spec,
                teacher_model.bound), teacher_params, x, chunk)
    elif c.with_mask and "m_field_mlp" in teacher_params:
        targets["mask"] = _eval_chunked(
            lambda tp, q: fields.apply_mlp(
                tp["m_field_mlp"],
                fields.position_features(teacher_model, tp, q))[0],
            teacher_params, x, chunk)
    return x, targets


def _eval_chunked(fn, params, x: jax.Array, chunk: int) -> jax.Array:
    """Chunked jitted eval. `params` rides as a jit ARGUMENT, never a
    closure constant: closed-over tables are baked into the HLO payload,
    which at quality-recipe scale (~100 MB of CP/VM tables) overwhelms
    the remote-compile relay (observed: broken-pipe compile failures and
    minute-scale compile times on the axon backend)."""
    n = x.shape[0]
    jfn = jax.jit(fn)
    outs = [jfn(params, x[i: i + chunk]) for i in range(0, n, chunk)]
    return jnp.concatenate(outs, axis=0)


def distill_to_mlp(
    teacher_model: NerfModel,
    teacher_params: Params,
    key: jax.Array,
    n_points: int = 1 << 22,
    batch: int = 1 << 15,
    iters: int = 8000,
    lr: float = 2e-3,
    student_model: Optional[NerfModel] = None,
    render_check: int = 2,
    render_hw: int = 128,
) -> Tuple[NerfModel, Params, Dict[str, Any]]:
    """Fit the MLP family to a hash-grid checkpoint; see module docstring.

    Returns (student_model, student_params, report) where report carries
    the final per-target match losses and `render_psnr` (student frames
    scored against teacher frames, the end-to-end fidelity number).
    """
    import optax

    teacher_mlp = teacher_model.is_mlp_field
    if student_model is None:
        # hashgrid teacher -> the flagship MLP twin; MLP-family (grid)
        # teacher -> the same config with the tables stripped (the
        # serving-distillation default: quality recipe -> fused-path
        # student that fits the VMEM budget)
        student_model = fields.make_model(
            student_config(teacher_model.cfg), teacher_model.render_cfg)

    k_init, k_data, k_train = jax.random.split(key, 3)
    batch = min(batch, n_points)
    x, targets = build_targets(teacher_model, teacher_params, k_data, n_points)

    student = fields.init_params(student_model, k_init)
    # identical-structure heads transfer exactly
    copied = []
    for name in ("view_mlp", "samvit_mlp", "samvit_norm", "mask_mlp"):
        if name in teacher_params:
            student[name] = jax.tree.map(jnp.asarray, teacher_params[name])
            copied.append(name)

    train_tree: Params = {"grid_mlp": student["grid_mlp"],
                          "prop": student["prop"]}
    if "cp_lines" in student:
        train_tree["cp_lines"] = student["cp_lines"]
    for k in ("vm_planes", "vm_lines",
              "sigma_cp_lines", "sigma_vm_planes", "sigma_vm_lines"):
        if k in student:
            train_tree[k] = student[k]
    if "sam" in targets:
        train_tree["s_field_mlp"] = student["s_field_mlp"]
    if "mask" in targets:
        train_tree["m_field_mlp"] = student["m_field_mlp"]

    # grids train at ~10x the MLP lr (TensoRF's lr split; a single lr leaves
    # the CP line tables underfit — measured +1.1 dB held-out on the rank-96
    # CP student at 4k distill iters, 12.5 -> 13.6 dB)
    def label(tree):
        grid_keys = ("cp_lines", "vm_planes", "vm_lines",
                     "sigma_cp_lines", "sigma_vm_planes", "sigma_vm_lines")
        # expand to full param structure (multi-res cp_lines is a LIST of
        # tables; multi_transform labels must mirror the leaves)
        return {k: jax.tree.map(
            lambda _, lab="lines" if k in grid_keys else "rest": lab, v)
            for k, v in tree.items()}

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {"lines": optax.adam(10.0 * lr, eps=1e-15),
             "rest": optax.adam(lr, eps=1e-15)},
            label(train_tree)))
    opt_state = tx.init(train_tree)
    n = x.shape[0]
    steps_per_epoch = n // batch

    def loss_fn(tp, frozen, xb, tb):
        p = dict(frozen)
        p.update(tp)
        losses = {"field": _match_loss(
            _student_field(student_model, p, xb), tb["field"],
            teacher_mlp=teacher_mlp)}
        for i in range(len(student_model.cfg.prop_resolutions)):
            losses[f"prop{i}"] = _match_loss(
                _student_prop(student_model, p, i, xb), tb[f"prop{i}"],
                teacher_mlp=teacher_mlp)
        if "sam" in tb:
            h = fields.position_features(student_model, p, xb)
            out, _ = fields.apply_mlp(p["s_field_mlp"], h)
            losses["sam"] = jnp.mean((out - tb["sam"]) ** 2)
        if "mask" in tb:
            h = fields.position_features(student_model, p, xb)
            out, _ = fields.apply_mlp(p["m_field_mlp"], h)
            losses["mask"] = jnp.mean((out - tb["mask"]) ** 2)
        return sum(losses.values()), losses

    # x/targets/frozen params ride as jit ARGUMENTS (a closure would bake
    # the ~100 MB point/target pools into the HLO payload and overwhelm
    # the remote-compile relay — see _eval_chunked)
    @jax.jit
    def epoch(tp, frozen, xs, tgt, opt_state, perm):
        def step(carry, idx):
            tp, opt_state = carry
            xb = xs[idx]
            tb = jax.tree.map(lambda t: t[idx], tgt)
            (_, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(tp, frozen, xb, tb)
            updates, opt_state = tx.update(grads, opt_state, tp)
            tp = optax.apply_updates(tp, updates)
            return (tp, opt_state), losses
        idxs = perm[: steps_per_epoch * batch].reshape(steps_per_epoch, batch)
        (tp, opt_state), losses = jax.lax.scan(step, (tp, opt_state), idxs)
        return tp, opt_state, jax.tree.map(lambda l: l[-1], losses)

    n_epochs = max(1, iters // steps_per_epoch)
    losses = {}
    for e in range(n_epochs):
        perm = jax.random.permutation(jax.random.fold_in(k_train, e), n)
        train_tree, opt_state, losses = epoch(train_tree, student, x,
                                              targets, opt_state, perm)

    student.update(train_tree)
    report: Dict[str, Any] = {
        "losses": {k: float(v) for k, v in losses.items()},
        "copied_heads": copied,
        "iters": n_epochs * steps_per_epoch,
    }
    if render_check:
        report["render_psnr"] = _render_fidelity(
            teacher_model, teacher_params, student_model, student,
            n_frames=render_check, hw=render_hw)
    return student_model, student, report


def _render_fidelity(tm, tp, sm, sp, n_frames: int, hw: int) -> float:
    """PSNR of student renders against teacher renders over an orbit."""
    from sanerf_tpu.models import renderer

    mses = []
    for i in range(n_frames):
        ang = 2.0 * np.pi * i / max(n_frames, 1)
        pose = _orbit_pose(ang, radius=2.0, height=0.6)
        f = 0.5 * hw / np.tan(0.5 * np.deg2rad(60.0))
        rays_o, rays_d = _frame_rays(pose, f, hw)
        imgs = []
        for model, params in ((tm, tp), (sm, sp)):
            out = renderer.render_staged(
                model, params, rays_o, rays_d, chunk=hw * hw)
            imgs.append(np.asarray(out["image"], np.float32))
        mses.append(float(np.mean((imgs[0] - imgs[1]) ** 2)))
    mse = max(float(np.mean(mses)), 1e-10)
    return float(-10.0 * np.log10(mse))


def _orbit_pose(ang: float, radius: float, height: float) -> np.ndarray:
    eye = np.array([radius * np.cos(ang), height, radius * np.sin(ang)])
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = (
        right, up2, -fwd, eye)
    return pose


def _frame_rays(pose: np.ndarray, focal: float, hw: int):
    i, j = np.meshgrid(np.arange(hw) + 0.5, np.arange(hw) + 0.5,
                       indexing="xy")
    dirs = np.stack([(i - hw / 2) / focal, -(j - hw / 2) / focal,
                     -np.ones_like(i)], axis=-1).reshape(-1, 3)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
    return (jnp.asarray(rays_o, jnp.float32),
            jnp.asarray(rays_d, jnp.float32))
