"""Volume renderer: proposal-network hierarchical sampling + compositing.

Rebuild of `NeRFRenderer.run/render` (nerf/renderer.py:142-464) as a pure
function. The reference's design — fixed per-level sample counts (128/64/32),
no occupancy grid, no ray compaction — is already the TPU-optimal shape:
every level is a dense [N, T] computation (SURVEY.md §7 design stance), so
`run_rays` compiles to one static XLA program per (shape, option) signature.

Differences from the reference by design:
- randomness is explicit (`key`); `perturb` threads stratified jitter keys.
- `update_proposal` is a static bool realized as stop_gradient (the torch
  version toggles `set_grad_enabled`, renderer.py:290); jit caches both
  variants.
- staged inference pads the last chunk to `max_ray_batch` so one compiled
  program serves any image size (renderer.py:189-219 reallocates per chunk).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from sanerf_tpu.models import fields
from sanerf_tpu.ops.sh import sh_encode
from sanerf_tpu.models.fields import NerfModel, Params
from sanerf_tpu.ops import (
    composite,
    compute_weights,
    compute_weights_from_deltas,
    contract,
    contract_T,
    distort_loss,
    near_far_from_aabb,
    proposal_loss,
    sample_pdf,
    spacing_fn,
    spacing_fn_inv,
    uniform_bins,
)


def default_aabb(model: NerfModel) -> jax.Array:
    b = model.render_cfg.bound
    return jnp.asarray([-b, -b, -b, b, b, b], jnp.float32)


def run_rays(
    model: NerfModel,
    params: Params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    training: bool = False,
    perturb: bool = False,
    bg_color: Any = 1.0,
    cam_near_far: Optional[jax.Array] = None,
    update_proposal: bool = True,
    return_feats: bool = False,
    return_mask: bool = False,
    aabb: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Render a ray batch (the hot loop; reference renderer.py:221-464).

    Args:
      rays_o, rays_d: [N, 3].
      key: PRNG key (required when perturb).
      bg_color: scalar or [N, 3].
      cam_near_far: per-ray [N, 2] (or [1, 2]) near/far override.
      aabb: [6] scene box; defaults to the config bound box. The GUI edits
        this live (gui.py:317-320), so it is a runtime argument, not static.

    Returns dict with: image [N,3], depth [N], weights_sum [N]; training
    extras (weights, num_points, proposal_loss, distort_loss) on the RGB
    stage; samvit [N,256] when return_feats; instance_mask_logits [N,I]
    when return_mask.
    """
    cfg = model.render_cfg
    mc = model.cfg
    N = rays_o.shape[0]
    num_steps = cfg.num_steps

    if aabb is None:
        aabb = default_aabb(model)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)
    if cam_near_far is not None:
        nears = jnp.maximum(nears, cam_near_far[:, :1])
        fars = jnp.minimum(fars, cam_near_far[:, 1:2])

    s_nears = spacing_fn(nears)  # [N, 1]
    s_fars = spacing_fn(fars)

    if perturb:
        assert key is not None, "perturb requires a PRNG key"
        keys = jax.random.split(key, len(num_steps))
    else:
        keys = [None] * len(num_steps)

    results: Dict[str, jax.Array] = {}
    all_bins, all_weights = [], []
    save_inter = mc.with_mask and mc.mask_mlp_type == "adaptive"
    # inference fast path: transposed fused encode+MLP kernels (no VJP)
    has_grids = (mc.mlp_cp_rank > 0 or mc.mlp_vm_rank > 0
                 or model.has_sigma_grid)
    # the transposed kernels cannot express a skip connection AT the last
    # layer (the skip dot needs a following layer to feed) — the field
    # MLP's skip sits at depth//2, which collides only for depth <= 2
    skip_ok = mc.mlp_field_depth // 2 != mc.mlp_field_depth - 1
    fast = (model.is_mlp_field and not training and not save_inter
            and cfg.use_fused_mlp and skip_ok
            and (not has_grids
                 or (cfg.cp_fused
                     and model.grid_table_bytes <= cfg.grid_vmem_budget)))
    fast_comp = fast and not mc.sum_after_mlp and not return_mask
    # pure-RGB frames additionally fuse the final-level composite into the
    # field kernel's epilogue (fields.field_composite_T)
    fast_epi = fast_comp and not return_feats
    interp = jax.default_backend() == "cpu"
    if fast:
        # per-level geometry (resample/spacing/contraction) runs in the
        # ray kernels (ops/ray_kernels.py); they consume one packed
        # [N, 8] ray tensor
        rays8 = jnp.concatenate(
            [rays_o, rays_d, s_nears, s_fars], axis=1).astype(jnp.float32)

    bins = None
    weights = None
    sigmas = None
    outputs = None
    features = None
    masks = None
    for level, T in enumerate(num_steps):
        last = level == len(num_steps) - 1
        xyzs = xyzs_T = dl = None
        if fast:
            # the whole inter-level glue — inverse-CDF resample, spacing
            # warp, midpoints/deltas, contraction — in one VMEM kernel per
            # level, emitting dims-first coordinates for the MLP kernels.
            # perturb threads the SAME uniform draws the XLA path uses as a
            # jitter input (drawn here in XLA, tiny [N, T+1] tensors), so
            # spp accumulation sees genuinely different stratified samples
            from sanerf_tpu.ops.ray_kernels import (ray_level, ray_level0,
                                                    pick_pack_q)

            pq = 0
            if last and fast_epi and cfg.packed_epilogue:
                pq = pick_pack_q(T, N)
                pq = 0 if pq <= 1 else pq
            ts_p = dl_p = None
            if level == 0:
                jit = (None if keys[0] is None else
                       (jax.random.uniform(keys[0], (N, T + 1)) - 0.5) / T)
                bins, rays_t, dl, x3, *packed = ray_level0(
                    rays8, T, cfg.contract, interpret=interp, jitter=jit,
                    pack_q=pq)
            else:
                jit = (None if keys[level] is None else
                       (jax.random.uniform(keys[level], (N, T + 1)) - 0.5)
                       / (T + 1))
                # level-0 bins are only the analytic uniform grid when
                # unjittered; perturbed frames must resample the real edges
                bins, rays_t, dl, x3, *packed = ray_level(
                    rays8, weights, bins, T, cfg.contract,
                    uniform_prev=level == 1 and not perturb,
                    interpret=interp, jitter=jit, pack_q=pq)
            if pq:
                ts_p, dl_p = packed
            if cfg.flatten_kernel:
                from sanerf_tpu.ops.ray_kernels import flatten3_nt

                xyzs_T = flatten3_nt(x3, interpret=interp)
            else:
                xyzs_T = x3.reshape(3, N * T)
        else:
            if level == 0:
                bins = uniform_bins(N, T, keys[level])  # [N, T+1]
            else:
                bins = jax.lax.stop_gradient(
                    sample_pdf(bins, weights, T + 1, keys[level])
                )  # [N, T+1]

            real_bins = spacing_fn_inv(s_nears * (1.0 - bins) + s_fars * bins)
            rays_t = (real_bins[..., 1:] + real_bins[..., :-1]) / 2.0  # [N, T]
        if not fast or (last and not fast_epi and (mc.with_sam or return_mask)):
            # point-major coords for the XLA field path and the SAM/mask
            # feature lookups (XLA drops this when nothing consumes it).
            # Arrays born 2-D keep GEMM-friendly {1,0} layouts end to end;
            # flattening a [N, T, C] intermediate later costs a physical
            # transpose (profiled ~30% of a frame)
            if fast:
                xyzs = xyzs_T.T  # already contracted by the ray kernel
            else:
                xyzs = (
                    rays_o[:, None, :] + rays_d[:, None, :] * rays_t[..., None]
                ).reshape(N * T, 3)
                if cfg.contract:
                    xyzs = contract(xyzs)

        if not last:
            sigmas = fields.density(model, params, xyzs, proposal=level,
                                    fast=fast, x_T=xyzs_T)
            sigmas = sigmas.reshape(N, T)
            if not update_proposal:
                sigmas = jax.lax.stop_gradient(sigmas)
        else:
            dirs_ray = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
            # pure-RGB frames: field query + alpha composite fused in ONE
            # kernel — the [16, N*T] field tensor (0.5 GB/frame at 512^2)
            # never reaches HBM and the XLA composite fusion (profiled
            # ~10 ms/frame of loopified broadcast-reduce) disappears
            if fast_epi:
                if cfg.view_in_kernel or pq:
                    # SH encode + per-ray view MLP in the kernel's epilogue
                    # (the packed-epilogue path only exists in-kernel)
                    _gsum_epi, depth_epi, wsum_epi, rgb_epi = (
                        fields.field_composite_T(
                            model, params, xyzs_T,
                            dl_p if pq else dl, ts_p if pq else rays_t,
                            opaque=cfg.background == "last_sample",
                            rays8=rays8, with_view=True,
                            pack_q=pq or 1, T=T if pq else None))
                else:
                    # serving default: composite fused in-kernel (the
                    # [16, N*T] field tensor never reaches HBM), SH + view
                    # MLP as XLA ops on the per-ray sums — measured faster
                    # than the in-kernel view epilogue at every serving T
                    # (see RenderConfig.view_in_kernel)
                    gsum_epi, depth_epi, wsum_epi = fields.field_composite_T(
                        model, params, xyzs_T, dl, rays_t,
                        opaque=cfg.background == "last_sample",
                        with_view=False)
                    rgb_epi = None
                sigmas = None
            elif fast_comp:
                # dims-first field query; compositing stays transposed (the
                # point-major [P, 31] colors tensor + its per-point SH —
                # directions are constant along a ray, so sum_t w*sh =
                # weights_sum * sh(ray) — profiled ~20 ms/frame). NOTE: a
                # VMEM composite kernel (ops/composite_t.py) was tried and
                # measured SLOWER end-to-end (the [C, NT] -> [C, N, T]
                # relayout XLA must do to feed it costs more than the
                # composite saves); XLA's fused broadcast-reduce stays.
                fT = fields.field_forward_T(
                    model, params,
                    xyzs_T if xyzs_T is not None else xyzs,
                    transposed=xyzs_T is not None)
                outputs = {"fT": fT}
                sigmas = fields.density_activation(model, fT[0]).reshape(N, T)
            else:
                dirs = jnp.broadcast_to(
                    dirs_ray[:, None, :], (N, T, 3)).reshape(N * T, 3)
                outputs = fields.forward(model, params, xyzs, dirs, save_inter,
                                         fast=fast, x_T=xyzs_T)
                sigmas = outputs["sigma"].reshape(N, T)
            if mc.with_sam and not fast_epi:
                features = fields.sam_features(model, params, xyzs)
            if return_mask and mc.mask_mlp_type in ("default", "lightweight_mask"):
                masks = fields.mask_grid_features(model, params, xyzs)

        if sigmas is not None:
            if dl is not None:
                weights = compute_weights_from_deltas(
                    dl, sigmas,
                    opaque_background=cfg.background == "last_sample")
            else:
                weights = compute_weights(
                    real_bins, sigmas,
                    opaque_background=cfg.background == "last_sample")
        if training:
            all_bins.append(bins)
            all_weights.append(weights)

    T_last = num_steps[-1]
    # field outputs are flat [N*T, C]; reshape (free bitcast) only where a
    # per-ray reduction needs the [N, T, C] view
    per_ray = lambda x: x.reshape(N, T_last, -1)

    if fast_epi:
        # per-ray sums came out of the kernel epilogue already
        weights_sum = wsum_epi
        depth = depth_epi
        if rgb_epi is None:
            # hybrid: view head in XLA over the kernel's per-ray sums
            # (identical math to the fast_comp tail below)
            g_sum = gsum_epi[:, 1 : 1 + mc.geom_feat_dim]
            sh_ray = sh_encode(dirs_ray, mc.sh_degree)
            f_image = jnp.concatenate(
                [g_sum, weights_sum[:, None] * sh_ray], axis=-1)
        else:
            f_image = None
        geo_feat = None
        colors = None
        geo_sum_for_mid = None
    elif fast_comp:
        fT = outputs["fT"]
        geo_T = fT[1 : 1 + mc.geom_feat_dim]  # [15, N*T]
        g_sum = jnp.sum(
            geo_T.reshape(-1, N, T_last) * weights[None], axis=-1
        ).T  # [N, 15]
        weights_sum = jnp.sum(weights, axis=-1)
        depth = jnp.sum(weights * rays_t, axis=-1)
        sh_ray = sh_encode(dirs_ray, mc.sh_degree)  # [N, 16]
        f_image = jnp.concatenate(
            [g_sum, weights_sum[:, None] * sh_ray], axis=-1)
        geo_feat = None
        colors = None
        geo_sum_for_mid = g_sum
    else:
        colors = outputs["color"]  # [N*T, 31]
        geo_feat = outputs["geo_feat"]
        weights_sum, depth, f_image = composite(weights, rays_t, per_ray(colors))
        geo_sum_for_mid = None

    view_inter = []
    f_colors = None
    if fast_epi and rgb_epi is not None:
        image = rgb_epi  # sigmoid applied in-kernel; bg blend below
    elif fast_epi:
        rgb_logits, _ = fields.apply_mlp(params["view_mlp"], f_image)
        image = jax.nn.sigmoid(rgb_logits)
    elif mc.sum_after_mlp:
        # per-sample view MLP then composite (renderer.py:339-342)
        f_colors, view_inter = fields.apply_mlp(params["view_mlp"], colors, save_inter)
        f_colors_sum = jnp.sum(weights[..., None] * per_ray(f_colors), axis=-2)
        image = jax.nn.sigmoid(f_colors_sum)
    else:
        rgb_logits, view_inter = fields.apply_mlp(params["view_mlp"], f_image, save_inter)
        image = jax.nn.sigmoid(rgb_logits)  # (renderer.py:345)

    if training and not mc.with_mask and not mc.with_sam:
        results["num_points"] = jnp.asarray(N * num_steps[-1])
        results["weights"] = weights
        results["proposal_loss"] = (
            proposal_loss(all_bins, all_weights)
            if update_proposal
            else jnp.asarray(0.0)
        )
        results["distort_loss"] = distort_loss(bins, weights)

    bg = jnp.asarray(bg_color, jnp.float32)
    image = image + (1.0 - weights_sum)[..., None] * bg

    results["weights_sum"] = weights_sum
    results["depth"] = depth
    results["image"] = image

    sam_inter = []
    if mc.with_sam and not fast_epi:
        # computed whenever the SAM field exists (renderer.py:364 gates only
        # on with_sam); XLA dead-code-eliminates it when unused. The fused-
        # composite path skips it structurally (return_feats is False there
        # and per-point weights never materialize)
        if mc.sum_after_mlp:
            # per-point head then composite (renderer.py:365-375)
            if mc.sam_use_view_direction:
                f = jnp.concatenate([features, f_colors, f_colors], axis=-1)
            else:
                f = jnp.concatenate([features, geo_feat, f_colors], axis=-1)
            samvit_out, sam_inter = fields.apply_samvit_head(model, params, f, save_inter)
            samvit = jnp.sum(weights[..., None] * per_ray(samvit_out), axis=-2)
        else:
            # composite-then-head: one MLP per ray, not per sample
            # (renderer.py:377-388)
            f_sam = jnp.sum(weights[..., None] * per_ray(features), axis=-2)
            if mc.sam_use_view_direction:
                mid = f_image
            elif geo_sum_for_mid is not None:
                mid = geo_sum_for_mid
            else:
                mid = jnp.sum(weights[..., None] * per_ray(geo_feat), axis=-2)
            f = jnp.concatenate([f_sam, mid, image, depth[..., None]], axis=-1)
            samvit, sam_inter = fields.apply_samvit_head(model, params, f, save_inter)
        if return_feats:
            results["samvit"] = samvit

    if return_mask:
        point_masks = _mask_head(
            model, params, outputs, masks, colors,
            view_inter=view_inter,
            sam_inter=sam_inter,
        )
        results["instance_mask_logits"] = jnp.sum(
            jax.lax.stop_gradient(weights)[..., None] * per_ray(point_masks),
            axis=-2,
        )  # (renderer.py:453-454)

    return results


def _mask_head(
    model: NerfModel,
    params: Params,
    outputs: Dict[str, Any],
    m_feats: Optional[jax.Array],
    colors: jax.Array,
    view_inter,
    sam_inter,
) -> jax.Array:
    """Per-point mask logits, 3 variants (renderer.py:392-451)."""
    mc = model.cfg
    mm = params["mask_mlp"]
    sg = jax.lax.stop_gradient
    if mc.mask_mlp_type == "default":
        m = jnp.concatenate([m_feats, sg(outputs["geo_feat"])], axis=-1)
        out, _ = fields.apply_skip_mlp(mm, m, ())
        return out
    if mc.mask_mlp_type == "lightweight_mask":
        m = jnp.concatenate([m_feats, sg(colors)], axis=-1)
        out, _ = fields.apply_mlp(mm, m)
        return out
    # adaptive: ladder of linears over detached intermediate activations;
    # NO inter-layer activations (renderer.py:399-451)
    gi = outputs["grid_mlp_inter"]
    lin = fields.apply_linear
    cat = lambda *xs: jnp.concatenate(xs, axis=-1)
    if mc.adaptive_mlp_type == "rgb":
        m = lin(mm[0], sg(outputs["grid_output"]))
        m = lin(mm[1], cat(gi[0], m))
        m = lin(mm[2], cat(gi[1], m))
        m = lin(mm[3], cat(gi[-1], m))
        m = lin(mm[4], cat(view_inter[0], m))
        m = lin(mm[5], cat(view_inter[1], m))
        m = lin(mm[6], m)
        return lin(mm[7], m)
    if mc.adaptive_mlp_type == "density":
        m = lin(mm[0], sg(outputs["grid_output"]))
        m = lin(mm[1], cat(gi[0], m))
        m = lin(mm[2], cat(gi[1], m))
        m = lin(mm[3], cat(gi[-1], m))
        m = lin(mm[4], m)
        return lin(mm[5], m)
    if mc.adaptive_mlp_type == "sam":
        m = lin(mm[0], gi[0])
        m = lin(mm[1], cat(gi[1], m))
        m = lin(mm[2], cat(gi[-1], m))
        m = lin(mm[3], cat(sam_inter[0], m))
        m = lin(mm[4], cat(sam_inter[1], m))
        m = lin(mm[5], cat(sam_inter[2], m))
        return lin(mm[6], cat(sam_inter[3], m))
    raise ValueError(mc.adaptive_mlp_type)


#: Jitted renderer entry point. `model` and all mode flags are static; jit
#: caches one executable per (shape, mode) signature. This is THE function
#: every production path calls — raw `run_rays` is for composition inside
#: other jitted programs (e.g. the train step).
render_rays = jax.jit(
    run_rays,
    static_argnames=(
        "model", "training", "perturb", "update_proposal", "return_feats",
        "return_mask",
    ),
)


@functools.partial(
    jax.jit,
    static_argnames=("model", "chunk", "return_feats", "return_mask"),
)
def render_frame(
    model: NerfModel,
    params: Params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    *,
    chunk: int = 65536,
    return_feats: bool = False,
    return_mask: bool = False,
    bg_color: float = 1.0,
    aabb: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Whole-frame inference as ONE jitted program.

    `render_staged` dispatches one program per chunk; through a remote/relay
    runtime each dispatch costs tens of ms of latency (profiled: ~250 ms of
    a 512^2 frame was host/dispatch gaps). Here the chunk loop is a
    `lax.map` inside a single program: one dispatch, device stays busy, and
    peak memory is still one chunk's activations. Ray count must not exceed
    ceil(N/chunk)*chunk after padding (handled internally).
    """
    N = rays_o.shape[0]
    n_chunks = max(1, -(-N // chunk))
    pad = n_chunks * chunk - N
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.broadcast_to(rays_o[-1:], (pad, 3))], 0)
        rays_d = jnp.concatenate([rays_d, jnp.broadcast_to(rays_d[-1:], (pad, 3))], 0)
    ro = rays_o.reshape(n_chunks, chunk, 3)
    rd = rays_d.reshape(n_chunks, chunk, 3)
    idx = jnp.arange(n_chunks)

    def body(args):
        o, d, i = args
        # fold the chunk index in — one key shared across chunks would give
        # correlated stratified jitter, defeating spp variance reduction
        k = None if key is None else jax.random.fold_in(key, i)
        out = run_rays(
            model, params, o, d, k, bg_color=bg_color,
            perturb=key is not None, aabb=aabb,
            return_feats=return_feats, return_mask=return_mask,
        )
        keep = {"image", "depth", "weights_sum"}
        if return_feats:
            keep.add("samvit")
        if return_mask:
            keep.add("instance_mask_logits")
        return {k: v for k, v in out.items() if k in keep}

    if n_chunks == 1:
        # single-chunk frames skip lax.map: the loop's dynamic-update-slice
        # plumbing alone profiled at ~25-37 ms/frame
        out = body((ro[0], rd[0], idx[0]))
        return {k: v[:N] for k, v in out.items()}
    out = jax.lax.map(body, (ro, rd, idx))
    return {k: v.reshape(n_chunks * chunk, *v.shape[2:])[:N] for k, v in out.items()}


def render_staged(
    model: NerfModel,
    params: Params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    cam_near_far: Optional[jax.Array] = None,
    chunk: Optional[int] = None,
    **kwargs,
) -> Dict[str, jax.Array]:
    """Chunked whole-image inference (renderer.py:185-219).

    Pads the last chunk to the fixed chunk size so every chunk reuses one
    compiled program, then trims. Shared near/far ([1,2]) broadcasts.
    """
    N = rays_o.shape[0]
    chunk = chunk or model.render_cfg.max_ray_batch
    if N <= chunk:
        return render_rays(
            model, params, rays_o, rays_d, key,
            cam_near_far=cam_near_far, **kwargs,
        )

    outs = []
    for head in range(0, N, chunk):
        tail = min(head + chunk, N)
        ro, rd = rays_o[head:tail], rays_d[head:tail]
        cnf = cam_near_far
        if cnf is not None and cnf.shape[0] > 1:
            cnf = cnf[head:tail]
        pad = chunk - (tail - head)
        if pad:
            ro = jnp.concatenate([ro, jnp.broadcast_to(ro[-1:], (pad, 3))], 0)
            rd = jnp.concatenate([rd, jnp.broadcast_to(rd[-1:], (pad, 3))], 0)
            if cnf is not None and cnf.shape[0] > 1:
                cnf = jnp.concatenate([cnf, jnp.broadcast_to(cnf[-1:], (pad, 2))], 0)
        outs.append(
            render_rays(model, params, ro, rd, key, cam_near_far=cnf, **kwargs)
        )

    merged: Dict[str, jax.Array] = {}
    for k in outs[0]:
        vals = [o[k] for o in outs]
        if vals[0].ndim == 0:
            merged[k] = vals[0]
        else:
            merged[k] = jnp.concatenate(vals, axis=0)[:N]
    return merged
