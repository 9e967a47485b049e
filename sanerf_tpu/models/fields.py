"""NeRF field definitions: param pytrees + pure apply functions.

Rebuild of the reference `NeRFNetwork` (nerf/network.py:94-308) as data
(nested-dict param pytrees) plus pure functions, so the whole field stack is
one jittable computation:

- RGB branch: hash grid (16 lvl x 2ch, 2^19, finest 2048*bound) -> grid_mlp
  MLP(32 -> 64x3 -> 16) emitting sigma=trunc_exp(f[...,0]) + 15-d geometric
  feature (network.py:102-103, 221-229).
- View branch: SH(4) + view_mlp MLP(31 -> 32x3 -> 3) (network.py:106-107).
- 2 proposal fields: hash (5 lvl x 2ch, 2^17, res 128/256) + MLP(10 -> 16x2
  -> 1) (network.py:206-219).
- SAM feature field: s_grid (16 lvl x 8ch, finest 512) + samvit SkipConnMLP
  (-> 256, 5 layers, skip@2) + LayerNorm(256) (network.py:110-123).
- Mask field, 3 variants (network.py:125-203); `adaptive` consumes
  intermediate activations of the other MLPs (renderer wiring at
  renderer.py:399-451).

Intentional deviations from the reference (latent bugs fixed, noted):
- samvit/lightweight-mask MLP input dims are derived from the actual
  concatenated inputs; the reference hard-codes dims that only match its
  shipped recipes (e.g. network.py:121 assumes sam_use_view_direction).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from sanerf_tpu.config import HashGridConfig, ModelConfig, RenderConfig
from sanerf_tpu.ops import cpgrid, freq, hashgrid, vmgrid
from sanerf_tpu.ops.activation import shifted_softplus, trunc_exp
from sanerf_tpu.ops.freq import freq_encode, freq_output_dim
from sanerf_tpu.ops.sh import sh_encode, sh_output_dim

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# MLP primitives (replaces network.py:9-75 MLP / SkipConnMLP)
# ---------------------------------------------------------------------------


def init_linear(key, d_in: int, d_out: int, bias: bool) -> Params:
    """torch nn.Linear default init: U(-1/sqrt(d_in), 1/sqrt(d_in))."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / (d_in**0.5)
    p = {"w": jax.random.uniform(wkey, (d_in, d_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (d_out,), jnp.float32, -bound, bound)
    return p


def apply_linear(p: Params, x: jax.Array, hidden: bool = False) -> jax.Array:
    """Matmul in the weight dtype (bf16 inference casts activations down so
    the MXU runs true bf16) with fp32 accumulation.

    `hidden=True` emits the output in the weight dtype too: at bf16
    inference the inter-layer activations ([N, 256] tensors that dominate
    the frame's HBM traffic — profiled at 611 GB/s, 108 ms/frame in f32)
    halve. The MXU still accumulates in f32 internally; only the stored
    activation rounds. Final layers keep f32 outputs (sigma/color heads)."""
    out_dt = p["w"].dtype if hidden else jnp.float32
    y = jnp.dot(x.astype(p["w"].dtype), p["w"], preferred_element_type=out_dt)
    if "b" in p:
        y = (y + p["b"]).astype(out_dt)
    return y


def cast_params(params: Params, dtype=jnp.bfloat16) -> Params:
    """Cast float params for bf16 inference (fp32 accumulation is preserved
    by apply_linear). Use on frozen/inference param trees only."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )


def init_mlp(key, d_in: int, d_out: int, d_hidden: int, n_layers: int, bias: bool) -> List[Params]:
    keys = jax.random.split(key, n_layers)
    layers = []
    for l in range(n_layers):
        fin = d_in if l == 0 else d_hidden
        fout = d_out if l == n_layers - 1 else d_hidden
        layers.append(init_linear(keys[l], fin, fout, bias))
    return layers


def apply_mlp(
    layers: Sequence[Params], x: jax.Array, save_intermediates: bool = False
) -> Tuple[jax.Array, List[jax.Array]]:
    """ReLU MLP; optionally returns per-layer (detached) activations —
    post-ReLU for hidden layers, raw for the last (network.py:23-34).

    Inputs flatten to 2-D for the whole stack: on TPU a [N, T, C] dot
    lowers to a batched-GEMM path measured ~8x slower than the flat
    [N*T, C] GEMM (5% vs 40% MXU utilization)."""
    prefix = x.shape[:-1]
    if x.ndim > 2:
        x = x.reshape(-1, x.shape[-1])
    inter: List[jax.Array] = []
    n = len(layers)
    for l, p in enumerate(layers):
        x = apply_linear(p, x, hidden=l != n - 1)
        if l != n - 1:
            x = jax.nn.relu(x)
        if save_intermediates:
            inter.append(jax.lax.stop_gradient(x))
    if len(prefix) > 1:
        x = x.reshape(*prefix, x.shape[-1])
        inter = [i.reshape(*prefix, i.shape[-1]) for i in inter]
    return x, inter


def init_skip_mlp(
    key, d_in: int, d_out: int, d_hidden: int, n_layers: int,
    skip_layers: Sequence[int], bias: bool,
) -> List[Params]:
    keys = jax.random.split(key, n_layers)
    layers = []
    for l in range(n_layers):
        if l == 0:
            fin = d_in
        elif l in skip_layers:
            fin = d_hidden + d_in
        else:
            fin = d_hidden
        fout = d_out if l == n_layers - 1 else d_hidden
        layers.append(init_linear(keys[l], fin, fout, bias))
    return layers


def apply_skip_mlp(
    layers: Sequence[Params],
    x: jax.Array,
    skip_layers: Sequence[int],
    save_intermediates: bool = False,
) -> Tuple[jax.Array, List[jax.Array]]:
    """LeakyReLU MLP with input skip connections (network.py:36-75).
    Flattens to 2-D for the stack (see apply_mlp)."""
    prefix = x.shape[:-1]
    if x.ndim > 2:
        x = x.reshape(-1, x.shape[-1])
    x_in = x
    inter: List[jax.Array] = []
    n = len(layers)
    for l, p in enumerate(layers):
        if l in skip_layers:
            x = jnp.concatenate([x, x_in.astype(x.dtype)], axis=-1)
        x = apply_linear(p, x, hidden=l != n - 1)
        if l != n - 1:
            x = jax.nn.leaky_relu(x, negative_slope=0.01)
        if save_intermediates:
            inter.append(jax.lax.stop_gradient(x))
    if len(prefix) > 1:
        x = x.reshape(*prefix, x.shape[-1])
        inter = [i.reshape(*prefix, i.shape[-1]) for i in inter]
    return x, inter


def apply_layernorm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return p["w"] * (x - mu) * jax.lax.rsqrt(var + eps) + p["b"]


# ---------------------------------------------------------------------------
# The model: static spec object + param init + apply fns
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NerfModel:
    """Static (hashable) model specification; all shapes resolved here."""

    cfg: ModelConfig
    render_cfg: RenderConfig
    grid_spec: Optional[hashgrid.HashGridSpec]
    prop_specs: Tuple[hashgrid.HashGridSpec, ...]
    s_grid_spec: Optional[hashgrid.HashGridSpec]
    m_grid_spec: Optional[hashgrid.HashGridSpec]

    @property
    def is_mlp_field(self) -> bool:
        return self.cfg.field_type == "mlp"

    @property
    def bound(self) -> float:
        return self.render_cfg.grid_bound

    @property
    def has_sigma_grid(self) -> bool:
        """Dedicated direct-density tables present (mlp_sigma_*_rank > 0):
        sigma_grid_logit adds their component-sum to the density logit."""
        return self.is_mlp_field and (self.cfg.mlp_sigma_cp_rank > 0
                                      or self.cfg.mlp_sigma_vm_rank > 0)

    @property
    def grid_table_bytes(self) -> int:
        """Bytes of factorized tables the cp_fused kernels would pin in
        VMEM (bf16 whole-array operands), computed from the config alone.
        TPU VMEM is ~16 MB/core and is shared with the packed MLP weights
        and a [rows, block] activation slab — run_rays refuses the fused
        fast path when the tables exceed RenderConfig.grid_vmem_budget
        and serves through the XLA lookup instead (correct either way;
        the CPU interpret tests can't see the limit, hardware can)."""
        c = self.cfg
        if not self.is_mlp_field:
            return 0
        total = 0
        if c.mlp_cp_rank > 0:
            k = max(1, c.mlp_cp_rank // c.mlp_cp_levels)
            for r in cpgrid.level_resolutions(c.mlp_cp_res, c.mlp_cp_levels):
                total += 3 * r * k
        if c.mlp_vm_rank > 0:
            k = max(1, c.mlp_vm_rank // c.mlp_vm_levels)
            for r in cpgrid.level_resolutions(c.mlp_vm_res, c.mlp_vm_levels):
                total += 3 * (r * r + r) * k
        if c.mlp_sigma_cp_rank > 0:
            total += 3 * c.mlp_sigma_cp_res * c.mlp_sigma_cp_rank
        if c.mlp_sigma_vm_rank > 0:
            total += (3 * (c.mlp_sigma_vm_res ** 2 + c.mlp_sigma_vm_res)
                      * c.mlp_sigma_vm_rank)
        return 2 * total  # bf16 kernel operands

    @property
    def grid_out_dim(self) -> int:
        """Dim of the positional feature feeding grid_mlp (hash-grid output
        or Fourier features)."""
        if self.is_mlp_field:
            return (freq_output_dim(3, self.cfg.mlp_enc_freqs)
                    + self.cfg.mlp_cp_rank
                    + 3 * self.cfg.mlp_vm_rank)
        return self.grid_spec.output_dim

    @property
    def prop_in_dim(self) -> int:
        if self.is_mlp_field:
            return freq_output_dim(3, self.cfg.mlp_prop_enc_freqs)
        return self.prop_specs[0].output_dim

    @property
    def s_feat_dim(self) -> int:
        """Dim of the per-point SAM field feature (s_grid output, 128)."""
        if self.is_mlp_field:
            return self.cfg.mlp_sam_feat_dim
        return self.s_grid_spec.output_dim

    @property
    def m_feat_dim(self) -> int:
        if self.is_mlp_field:
            return self.cfg.mlp_mask_feat_dim
        return self.m_grid_spec.output_dim

    @property
    def view_in_dim(self) -> int:
        return sh_output_dim(self.cfg.sh_degree)

    @property
    def color_dim(self) -> int:
        # per-sample color feature = [geo_feat, sh(d)] (network.py:239)
        return self.cfg.geom_feat_dim + self.view_in_dim

    @property
    def samvit_in_dim(self) -> int:
        c = self.cfg
        s_dim = self.s_feat_dim
        if c.sum_after_mlp:
            # renderer.py:366-369: [features, f_colors|geo_feat, f_colors]
            per = 3 if c.sam_use_view_direction else c.geom_feat_dim
            return s_dim + per + 3
        # renderer.py:377-383: [f_sam, f_image|geo_feat_sum, image, depth]
        per = self.color_dim if c.sam_use_view_direction else c.geom_feat_dim
        return s_dim + per + 3 + 1

    def mask_out_dim(self) -> int:
        return self.cfg.n_inst + self.cfg.redundant_instance


def make_model(cfg: ModelConfig, render_cfg: RenderConfig) -> NerfModel:
    # the 'sam' adaptive mask ladder consumes samvit_mlp intermediate
    # activations (sam_inter[0..3], renderer.py) — it requires a SAM head
    # on the same model and at least 5 samvit layers; reject at build time
    # rather than IndexError at trace time (network.py:143-203)
    if cfg.with_mask and cfg.mask_mlp_type == "adaptive" \
            and cfg.adaptive_mlp_type == "sam":
        if not cfg.with_sam:
            raise ValueError(
                "adaptive_mlp_type='sam' requires with_sam=True: the mask "
                "ladder consumes samvit_mlp intermediate activations")
        if cfg.samvit_mlp_layers < 5:
            raise ValueError(
                "adaptive_mlp_type='sam' needs samvit_mlp_layers >= 5 "
                f"(got {cfg.samvit_mlp_layers}): the ladder taps 4 "
                "intermediate samvit activations")
    if cfg.field_type == "mlp":
        grid_spec = None
        prop_specs = tuple(None for _ in cfg.prop_resolutions)
        s_grid_spec = None
        m_grid_spec = None
        return NerfModel(
            cfg=cfg, render_cfg=render_cfg, grid_spec=None, prop_specs=(),
            s_grid_spec=None, m_grid_spec=None,
        )
    grid_spec = hashgrid.build_spec(
        HashGridConfig(
            input_dim=3,
            num_levels=cfg.grid_num_levels,
            level_dim=cfg.grid_level_dim,
            log2_hashmap_size=cfg.grid_log2_hashmap,
            # default 4096 = the reference's 2048 * bound(=2 contracted)
            # (network.py:102); the config value is authoritative so tests
            # and capacity sweeps can actually size the table
            desired_resolution=cfg.grid_desired_resolution,
        )
    )
    prop_specs = tuple(
        hashgrid.build_spec(
            HashGridConfig(
                input_dim=3,
                num_levels=cfg.prop_num_levels,
                level_dim=cfg.prop_level_dim,
                log2_hashmap_size=cfg.prop_log2_hashmap,
                desired_resolution=res,
            )
        )
        for res in cfg.prop_resolutions
    )
    s_grid_spec = None
    if cfg.with_sam:
        s_grid_spec = hashgrid.build_spec(
            HashGridConfig(
                input_dim=3,
                num_levels=cfg.s_grid_num_levels,
                level_dim=cfg.s_grid_level_dim,
                log2_hashmap_size=cfg.s_grid_log2_hashmap,
                desired_resolution=cfg.s_grid_desired_resolution,
            )
        )
    m_grid_spec = None
    if cfg.with_mask and cfg.mask_mlp_type == "default":
        m_grid_spec = hashgrid.build_spec(
            HashGridConfig(
                input_dim=3, num_levels=16, level_dim=8, log2_hashmap_size=19,
                desired_resolution=512,
            )
        )
    elif cfg.with_mask and cfg.mask_mlp_type == "lightweight_mask":
        m_grid_spec = hashgrid.build_spec(
            HashGridConfig(
                input_dim=3, num_levels=16, level_dim=2, log2_hashmap_size=10,
                desired_resolution=256,
            )
        )
    return NerfModel(
        cfg=cfg,
        render_cfg=render_cfg,
        grid_spec=grid_spec,
        prop_specs=prop_specs,
        s_grid_spec=s_grid_spec,
        m_grid_spec=m_grid_spec,
    )


def init_params(model: NerfModel, key: jax.Array) -> Params:
    c = model.cfg
    keys = iter(jax.random.split(key, 16))
    if model.is_mlp_field:
        # TPU flagship: Fourier features + MLPs (no tables, no gathers).
        # Same param-tree names as the hash-grid family so checkpointing,
        # freezing and the renderer are field-agnostic.
        params: Params = {
            "grid_mlp": init_skip_mlp(
                next(keys), model.grid_out_dim, 1 + c.geom_feat_dim,
                c.mlp_field_width, c.mlp_field_depth,
                skip_layers=(c.mlp_field_depth // 2,), bias=False,
            ),
            "view_mlp": init_mlp(
                next(keys), model.color_dim, 3, c.view_mlp_hidden,
                c.view_mlp_layers, bias=False,
            ),
            "prop": [
                {
                    "mlp": init_mlp(
                        next(keys), model.prop_in_dim, 1, c.mlp_prop_width,
                        c.mlp_prop_depth, bias=False,
                    ),
                }
                for _ in range(len(c.prop_resolutions))
            ],
        }
        if c.mlp_cp_rank > 0:
            params["cp_lines"] = (
                cpgrid.init_lines(next(keys), c.mlp_cp_res, c.mlp_cp_rank)
                if c.mlp_cp_levels == 1 else
                cpgrid.init_lines_multi(next(keys), c.mlp_cp_res,
                                        c.mlp_cp_rank, c.mlp_cp_levels))
        if c.mlp_vm_rank > 0:
            if getattr(c, "mlp_vm_levels", 1) == 1:
                params["vm_planes"], params["vm_lines"] = vmgrid.init_vm(
                    next(keys), c.mlp_vm_res, c.mlp_vm_rank)
            else:
                params["vm_planes"], params["vm_lines"] = vmgrid.init_vm_multi(
                    next(keys), c.mlp_vm_res, c.mlp_vm_rank, c.mlp_vm_levels)
        if c.mlp_sigma_cp_rank > 0:
            params["sigma_cp_lines"] = cpgrid.init_lines(
                next(keys), c.mlp_sigma_cp_res, c.mlp_sigma_cp_rank)
        if c.mlp_sigma_vm_rank > 0:
            params["sigma_vm_planes"], params["sigma_vm_lines"] = (
                vmgrid.init_vm(next(keys), c.mlp_sigma_vm_res,
                               c.mlp_sigma_vm_rank))
        if c.with_sam:
            params["s_field_mlp"] = init_mlp(
                next(keys), model.grid_out_dim, model.s_feat_dim,
                c.mlp_sam_width, c.mlp_sam_depth, bias=False,
            )
        if c.with_mask and c.mask_mlp_type in ("default", "lightweight_mask"):
            params["m_field_mlp"] = init_mlp(
                next(keys), model.grid_out_dim, model.m_feat_dim,
                c.mlp_mask_width, c.mlp_mask_depth, bias=False,
            )
    else:
        params = {
            "grid": hashgrid.init_params(next(keys), model.grid_spec),
            "grid_mlp": init_mlp(
                next(keys), model.grid_spec.output_dim, 1 + c.geom_feat_dim,
                c.grid_mlp_hidden, c.grid_mlp_layers, bias=False,
            ),
            "view_mlp": init_mlp(
                next(keys), model.color_dim, 3, c.view_mlp_hidden, c.view_mlp_layers,
                bias=False,
            ),
            "prop": [
                {
                    "grid": hashgrid.init_params(next(keys), spec),
                    "mlp": init_mlp(
                        next(keys), spec.output_dim, 1, c.prop_mlp_hidden,
                        c.prop_mlp_layers, bias=False,
                    ),
                }
                for spec in model.prop_specs
            ],
        }
        if c.with_sam:
            params["s_grid"] = hashgrid.init_params(next(keys), model.s_grid_spec)
        if c.with_mask and model.m_grid_spec is not None:
            params["m_grid"] = hashgrid.init_params(next(keys), model.m_grid_spec)
    if c.with_sam:
        params["samvit_mlp"] = init_skip_mlp(
            next(keys), model.samvit_in_dim, c.sam_feat_dim, c.samvit_mlp_hidden,
            c.samvit_mlp_layers, c.samvit_skip_layers, bias=True,
        )
        params["samvit_norm"] = {
            "w": jnp.ones((c.sam_feat_dim,)), "b": jnp.zeros((c.sam_feat_dim,))
        }
    if c.with_mask:
        params.update(_init_mask_head(model, next(keys)))
    return params


def _init_mask_head(model: NerfModel, key: jax.Array) -> Params:
    c = model.cfg
    out = model.mask_out_dim()
    keys = iter(jax.random.split(key, 12))
    if c.mask_mlp_type == "default":
        return {
            "mask_mlp": init_skip_mlp(
                next(keys), model.m_feat_dim + c.geom_feat_dim, out,
                256, 3, (), bias=False,
            ),
        }
    if c.mask_mlp_type == "lightweight_mask":
        # reference declares MLP(geom+view+4 -> out) but feeds
        # [m_grid(32), colors(31)] (network.py:142 vs renderer.py:396-398);
        # we size by the actual input
        d_in = model.m_feat_dim + model.color_dim
        return {
            "mask_mlp": init_mlp(next(keys), d_in, out, 64, 3, bias=False),
        }
    # adaptive: a ladder of bias-free linears over intermediate activations of
    # the frozen backbone MLPs; NO activations between them
    # (network.py:143-203, renderer.py:399-451)
    H = 96
    gmh = c.mlp_field_width if model.is_mlp_field else c.grid_mlp_hidden
    gin = model.grid_out_dim
    geo = 1 + c.geom_feat_dim
    vmh = c.view_mlp_hidden
    smh = c.samvit_mlp_hidden
    if c.adaptive_mlp_type == "rgb":
        dims = [
            (gin, H), (gmh + H, H), (gmh + H, H), (geo + H, H),
            (vmh + H, H), (vmh + H, H), (H, H), (H, c.n_inst),
        ]
    elif c.adaptive_mlp_type == "density":
        dims = [
            (gin, H), (gmh + H, H), (gmh + H, H), (geo + H, H),
            (H, H), (H, c.n_inst),
        ]
    elif c.adaptive_mlp_type == "sam":
        dims = [
            (gmh, 32), (gmh + 32, 32), (geo + 32, 64),
            (smh + 64, 256), (smh + 256, 256), (smh + 256, 256),
            (smh + 256, c.n_inst),
        ]
    else:
        raise ValueError(c.adaptive_mlp_type)
    return {"mask_mlp": [init_linear(next(keys), a, b, bias=False) for a, b in dims]}


# ---------------------------------------------------------------------------
# apply fns
# ---------------------------------------------------------------------------


def density_activation(model: NerfModel, f0: jax.Array) -> jax.Array:
    """Family-specific density activation: the reference's trunc_exp for
    the hashgrid family (activation.py:18), shifted softplus for the MLP
    flagship (see ops/activation.py for the stability rationale). The
    fused composite kernel (ops/fused_mlp_t.py) applies the same softplus
    in-kernel for the MLP fast path."""
    if model.is_mlp_field:
        return shifted_softplus(f0)
    return trunc_exp(f0)


def position_features(model: NerfModel, params: Params, x: jax.Array,
                      dtype=None) -> jax.Array:
    """The MLP family's positional feature: Fourier bands, plus the
    CP-line features when mlp_cp_rank > 0 (shared by the RGB, SAM and mask
    field MLPs — grid_out_dim accounts for the concat).

    When the training step injects `enc_alpha` (TrainConfig.anneal_iters,
    a traced scalar in [0, 1] — NOT a trainable leaf), the encode opens
    coarse-to-fine: PE bands via BARF's cosine window, multi-res CP levels
    via the same window over levels. At alpha=1 (and on every path that
    does not inject it, e.g. eval and the fused inference kernels) the
    output is bit-identical to the un-annealed encode."""
    alpha = params.get("enc_alpha")
    bw = (freq.anneal_band_weights(alpha, model.cfg.mlp_enc_freqs)
          if alpha is not None else None)
    h = freq_encode(x * (jnp.pi / model.bound), model.cfg.mlp_enc_freqs,
                    out_dtype=dtype, band_weights=bw)
    lookup = getattr(model.cfg, "grid_lookup", "auto")
    on_tpu = jax.default_backend() != "cpu"
    if model.cfg.mlp_cp_rank > 0:
        # auto: CP's one-hot form costs only R*K MACs/point — on the MXU
        # that is always cheaper than 6 serialized row gathers
        cp_lookup = ("onehot" if on_tpu else "gather") \
            if lookup == "auto" else lookup
        cl = params["cp_lines"]
        if isinstance(cl, (list, tuple)):
            cp = cpgrid.line_features_multi(
                cl, x, model.bound,
                level_weights=(cpgrid.anneal_level_weights(alpha, len(cl))
                               if alpha is not None else None),
                lookup=cp_lookup)
        else:
            cp_fn = (cpgrid.line_features_gather if cp_lookup == "gather"
                     else cpgrid.line_features)
            cp = cp_fn(cl, x, model.bound)
        h = jnp.concatenate([h, cp.astype(h.dtype)], axis=-1)
    if model.cfg.mlp_vm_rank > 0:
        planes = params["vm_planes"]
        top = planes[-1] if isinstance(planes, (list, tuple)) else planes
        if lookup == "auto":
            # VM's one-hot row contraction costs R*(R*K) MACs/point/mode;
            # keep it on the MXU up to ~4M MACs (res 256 x rank 32), where
            # it still beats the TPU's ~23 M rows/s gather unit
            R, K = top.shape[1], top.shape[3]
            vm_lookup = ("onehot" if on_tpu and R * R * K <= 4 * 2 ** 20
                         else "gather")
        else:
            vm_lookup = lookup
        if isinstance(planes, (list, tuple)):
            vm = vmgrid.vm_features_multi(
                planes, params["vm_lines"], x, model.bound,
                level_weights=(cpgrid.anneal_level_weights(alpha, len(planes))
                               if alpha is not None else None),
                lookup=vm_lookup)
        else:
            vm_fn = (vmgrid.vm_features_gather if vm_lookup == "gather"
                     else vmgrid.vm_features)
            vm = vm_fn(planes, params["vm_lines"], x, model.bound)
        h = jnp.concatenate([h, vm.astype(h.dtype)], axis=-1)
    return h


def sigma_grid_logit(model: NerfModel, params: Params,
                     x: jax.Array) -> Optional[jax.Array]:
    """TensoRF's direct density (arXiv:2203.09517 §4.1): the density-logit
    contribution is the PLAIN SUM of the dedicated sigma-grid components,
    so the photometric gradient reaches the tables with no MLP in between
    — the mechanism that lets factorized grids sharpen geometry orders of
    magnitude faster than a coordinate MLP. Added to (not replacing) the
    field MLP's density head, which starts near zero and learns a smooth
    residual. Returns [N] (f32) or None when the model has no sigma
    tables. Lookup dispatch mirrors position_features."""
    c = model.cfg
    if not model.is_mlp_field:
        return None
    lookup = getattr(c, "grid_lookup", "auto")
    on_tpu = jax.default_backend() != "cpu"
    out = None
    if c.mlp_sigma_cp_rank > 0 and "sigma_cp_lines" in params:
        lk = ("onehot" if on_tpu else "gather") if lookup == "auto" else lookup
        fn = (cpgrid.line_features_gather if lk == "gather"
              else cpgrid.line_features)
        out = jnp.sum(fn(params["sigma_cp_lines"], x, model.bound), axis=-1)
    if c.mlp_sigma_vm_rank > 0 and "sigma_vm_planes" in params:
        planes = params["sigma_vm_planes"]
        R, K = planes.shape[1], planes.shape[3]
        if lookup == "auto":
            lk = "onehot" if on_tpu and R * R * K <= 4 * 2 ** 20 else "gather"
        else:
            lk = lookup
        fn = (vmgrid.vm_features_gather if lk == "gather"
              else vmgrid.vm_features)
        s = jnp.sum(fn(planes, params["sigma_vm_lines"], x, model.bound),
                    axis=-1)
        out = s if out is None else out + s
    return out


def common_forward(
    model: NerfModel, params: Params, x: jax.Array, save_intermediates: bool = False,
    fast: bool = False, x_T: Optional[jax.Array] = None,
):
    """encode -> grid_mlp -> (sigma, geo_feat, grid_output)
    (network.py:221-229).

    `fast=True` (MLP family, inference only — no VJP) runs the encode+MLP
    chain as one transposed-layout Pallas kernel (ops/fused_mlp_t.py):
    activations never leave VMEM, vs the XLA chain whose [N, width]
    activations round-trip HBM every layer (profiled 82 -> 53 ms for the
    8.4M-point final level). grid_output is not materialized on this path.
    """
    if (model.is_mlp_field and fast and not save_intermediates
            and (not model.has_sigma_grid or model.render_cfg.cp_fused)):
        fT = field_forward_T(model, params, x if x_T is None else x_T,
                             transposed=x_T is not None)
        sigma = density_activation(model, fT[0])
        geo_feat = fT[1 : 1 + model.cfg.geom_feat_dim].T
        return sigma, geo_feat, None, []
    if model.is_mlp_field:
        grid_output = position_features(
            model, params, x, dtype=params["grid_mlp"][0]["w"].dtype)
        f, inter = apply_skip_mlp(
            params["grid_mlp"], grid_output,
            (model.cfg.mlp_field_depth // 2,), save_intermediates,
        )
    else:
        grid_output = hashgrid.hash_encode(
            x, params["grid"], model.grid_spec, model.bound
        )
        f, inter = apply_mlp(params["grid_mlp"], grid_output, save_intermediates)
    logit = f[..., 0]
    sg = sigma_grid_logit(model, params, x)
    if sg is not None:
        logit = logit + sg.astype(logit.dtype)
    sigma = density_activation(model, logit)
    geo_feat = f[..., 1:]
    return sigma, geo_feat, grid_output, inter


def forward(
    model: NerfModel,
    params: Params,
    x: jax.Array,
    d: jax.Array,
    save_intermediates: bool = False,
    fast: bool = False,
    x_T: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Full field query at the final level (network.py:231-246).

    x: [..., 3] contracted coordinates in [-bound, bound]; d: [..., 3] unit
    view directions. `color` is the raw [geo_feat, sh(d)] concat — the view
    MLP runs after compositing (renderer.py:338-345).
    """
    sigma, geo_feat, grid_output, inter = common_forward(
        model, params, x, save_intermediates, fast=fast, x_T=x_T)
    sh = sh_encode(d, model.cfg.sh_degree)
    color = jnp.concatenate([geo_feat, sh], axis=-1)
    return {
        "sigma": sigma,
        "geo_feat": geo_feat,
        "color": color,
        "grid_output": grid_output,
        "grid_mlp_inter": inter,
    }


def field_forward_T(model: NerfModel, params: Params, x, transposed: bool):
    """Fused-kernel field chain; returns the TRANSPOSED [16, P] output
    (row 0 = raw sigma logit, rows 1:16 = geo features) so callers can
    composite in dims-first layout without transposing the big tensor."""
    from sanerf_tpu.ops.fused_mlp_t import run_tmlp

    return run_tmlp(
        x, params["grid_mlp"], model.cfg.mlp_enc_freqs, model.bound,
        (model.cfg.mlp_field_depth // 2,), leaky=True,
        block=model.render_cfg.fused_block,
        transposed=transposed, cp_lines=params.get("cp_lines"),
        vm_planes=params.get("vm_planes"), vm_lines=params.get("vm_lines"),
        sigma_cp_lines=params.get("sigma_cp_lines"),
        sigma_vm_planes=params.get("sigma_vm_planes"),
        sigma_vm_lines=params.get("sigma_vm_lines"),
    )


def field_composite_T(model: NerfModel, params: Params, xT, dl, ts,
                      opaque: bool, rays8=None, with_view: bool = False,
                      pack_q: int = 1, T: Optional[int] = None):
    """Final-level field query + in-VMEM alpha composite in one kernel
    (ops/fused_mlp_t.run_tmlp_composite): the [16, N*T] field tensor never
    reaches HBM. Returns (gsum [N, 16] w-weighted field sums, depth [N],
    weights_sum [N]) — plus rgb [N, 3] (sigmoid, pre-background) when
    `with_view` runs the SH + view-MLP branch in the same epilogue.
    pack_q > 1 selects the lane-packed epilogue (dl/ts are then the ray
    kernels' packed [N//q, q*T, 1] outputs)."""
    from sanerf_tpu.ops.fused_mlp_t import run_tmlp_composite

    return run_tmlp_composite(
        xT, dl, ts, params["grid_mlp"], model.cfg.mlp_enc_freqs, model.bound,
        (model.cfg.mlp_field_depth // 2,), leaky=True, opaque=opaque,
        block=model.render_cfg.fused_block,
        rays8=rays8 if with_view else None,
        view_layers=params["view_mlp"] if with_view else None,
        sh_degree=model.cfg.sh_degree,
        cp_lines=params.get("cp_lines"),
        vm_planes=params.get("vm_planes"), vm_lines=params.get("vm_lines"),
        sigma_cp_lines=params.get("sigma_cp_lines"),
        sigma_vm_planes=params.get("sigma_vm_planes"),
        sigma_vm_lines=params.get("sigma_vm_lines"),
        pack_q=pack_q, T=T,
    )


def density(model: NerfModel, params: Params, x: jax.Array, proposal: int = -1,
            fast: bool = False, x_T: Optional[jax.Array] = None) -> jax.Array:
    """Density-only query; routes to proposal nets (network.py:248-259).
    `fast` as in common_forward (inference-only fused kernel)."""
    n_props = len(model.cfg.prop_resolutions)
    if 0 <= proposal < n_props:
        p = params["prop"][proposal]
        if model.is_mlp_field and fast:
            from sanerf_tpu.ops.fused_mlp_t import run_tmlp

            fT = run_tmlp(x if x_T is None else x_T, p["mlp"],
                          model.cfg.mlp_prop_enc_freqs, model.bound, (),
                          leaky=False, block=model.render_cfg.fused_prop_block,
                          transposed=x_T is not None)
            return density_activation(model, fT[0])
        if model.is_mlp_field:
            alpha = params.get("enc_alpha")
            bw = (freq.anneal_band_weights(alpha, model.cfg.mlp_prop_enc_freqs)
                  if alpha is not None else None)
            h = freq_encode(x * (jnp.pi / model.bound), model.cfg.mlp_prop_enc_freqs,
                            out_dtype=p["mlp"][0]["w"].dtype, band_weights=bw)
        else:
            h = hashgrid.hash_encode(
                x, p["grid"], model.prop_specs[proposal], model.bound
            )
        f, _ = apply_mlp(p["mlp"], h)
        return density_activation(model, f[..., 0])
    sigma, _, _, _ = common_forward(model, params, x)
    return sigma


def sam_features(model: NerfModel, params: Params, x: jax.Array) -> jax.Array:
    """Per-point SAM field feature (s_grid lookup, renderer.py:302-303; MLP
    field in the flagship family)."""
    if model.is_mlp_field:
        h = position_features(model, params, x,
                              dtype=params["s_field_mlp"][0]["w"].dtype)
        out, _ = apply_mlp(params["s_field_mlp"], h)
        return out
    return hashgrid.hash_encode(x, params["s_grid"], model.s_grid_spec, model.bound)


def mask_grid_features(model: NerfModel, params: Params, x: jax.Array) -> jax.Array:
    if model.is_mlp_field:
        h = position_features(model, params, x)
        out, _ = apply_mlp(params["m_field_mlp"], h)
        return out
    return hashgrid.hash_encode(x, params["m_grid"], model.m_grid_spec, model.bound)


def apply_samvit_head(
    model: NerfModel, params: Params, f: jax.Array, save_intermediates: bool = False
) -> Tuple[jax.Array, List[jax.Array]]:
    """SkipConnMLP + LayerNorm(256) (network.py:120-123)."""
    out, inter = apply_skip_mlp(
        params["samvit_mlp"], f, model.cfg.samvit_skip_layers, save_intermediates
    )
    return apply_layernorm(params["samvit_norm"], out, eps=1e-5), inter


def apply_total_variation(
    model: NerfModel, params: Params, x01: jax.Array, weight: float
) -> Params:
    """TV grad contribution for the active grid (network.py:261-267):
    s_grid when with_sam, m_grid when with_mask, else the RGB grid."""
    c = model.cfg
    if model.is_mlp_field:
        g: Params = {}
        if c.mlp_cp_rank > 0 and "cp_lines" in params:
            # 1-D TV on the CP lines (TensoRF's regularizer; controls the
            # view-dependent floaters factorized grids otherwise grow)
            cl = params["cp_lines"]
            g["cp_lines"] = (
                [cpgrid.grad_total_variation(l, weight) for l in cl]
                if isinstance(cl, (list, tuple)) else
                cpgrid.grad_total_variation(cl, weight))
        if c.mlp_vm_rank > 0 and "vm_planes" in params:
            vp, vl = params["vm_planes"], params["vm_lines"]
            if isinstance(vp, (list, tuple)):
                g["vm_planes"] = [
                    vmgrid.grad_total_variation_planes(p, weight) for p in vp]
                g["vm_lines"] = [
                    cpgrid.grad_total_variation(l, weight) for l in vl]
            else:
                g["vm_planes"] = vmgrid.grad_total_variation_planes(vp, weight)
                g["vm_lines"] = cpgrid.grad_total_variation(vl, weight)
        # dedicated sigma tables: TensoRF applies TV to the DENSITY grid
        # above all (their L_TV sums density + appearance components)
        if "sigma_cp_lines" in params:
            g["sigma_cp_lines"] = cpgrid.grad_total_variation(
                params["sigma_cp_lines"], weight)
        if "sigma_vm_planes" in params:
            g["sigma_vm_planes"] = vmgrid.grad_total_variation_planes(
                params["sigma_vm_planes"], weight)
            g["sigma_vm_lines"] = cpgrid.grad_total_variation(
                params["sigma_vm_lines"], weight)
        return g  # no tables otherwise; the band-limited encoding is smooth
    if c.with_sam:
        return {"s_grid": hashgrid.grad_total_variation(x01, params["s_grid"], model.s_grid_spec, weight)}
    if c.with_mask and model.m_grid_spec is not None:
        return {"m_grid": hashgrid.grad_total_variation(x01, params["m_grid"], model.m_grid_spec, weight)}
    return {"grid": hashgrid.grad_total_variation(x01, params["grid"], model.grid_spec, weight)}


def grid_resolutions(params: Params) -> Dict[str, int]:
    """Current (finest-level) resolution of every factorized table family
    present in `params` — keys "cp", "vm", "sigma_cp", "sigma_vm" (absent
    families omitted). This is the resolution 'state' the upsample
    schedule compares against its targets (no bookkeeping to
    checkpoint)."""
    out: Dict[str, int] = {}
    if "cp_lines" in params:
        cl = params["cp_lines"]
        out["cp"] = (cl[-1] if isinstance(cl, (list, tuple)) else cl).shape[1]
    if "vm_planes" in params:
        vp = params["vm_planes"]
        out["vm"] = (vp[-1] if isinstance(vp, (list, tuple)) else vp).shape[1]
    if "sigma_cp_lines" in params:
        out["sigma_cp"] = params["sigma_cp_lines"].shape[1]
    if "sigma_vm_planes" in params:
        out["sigma_vm"] = params["sigma_vm_planes"].shape[1]
    return out


def resize_grid_tables(model: NerfModel, params: Params,
                       targets: Dict[str, int]) -> Params:
    """Linear-resample every factorized table so the finest level reaches
    the target resolution (TensoRF's coarse-to-fine upsampling, §5.2);
    `targets` maps grid_resolutions keys to new resolutions (absent keys
    untouched). Multi-res ladders recompute their per-level geometric
    resolutions for the new top (cpgrid.level_resolutions), so a
    mid-schedule ladder keeps its coarse-to-fine shape. Alignment is exact
    under the align-corners lookup convention: the resized table
    represents the same continuous function, so training resumes without
    a loss spike."""
    p = dict(params)
    cp_res = targets.get("cp")
    if cp_res is not None and "cp_lines" in p:
        cl = p["cp_lines"]
        if isinstance(cl, (list, tuple)):
            p["cp_lines"] = [
                cpgrid.linresize(l, r) for l, r in
                zip(cl, cpgrid.level_resolutions(cp_res, len(cl)))]
        else:
            p["cp_lines"] = cpgrid.linresize(cl, cp_res)
    vm_res = targets.get("vm")
    if vm_res is not None and "vm_planes" in p:
        vp, vl = p["vm_planes"], p["vm_lines"]
        if isinstance(vp, (list, tuple)):
            pairs = [vmgrid.resize_vm(pp, ll, r) for pp, ll, r in
                     zip(vp, vl, cpgrid.level_resolutions(vm_res, len(vp)))]
            p["vm_planes"] = [a for a, _ in pairs]
            p["vm_lines"] = [b for _, b in pairs]
        else:
            p["vm_planes"], p["vm_lines"] = vmgrid.resize_vm(vp, vl, vm_res)
    scp = targets.get("sigma_cp")
    if scp is not None and "sigma_cp_lines" in p:
        p["sigma_cp_lines"] = cpgrid.linresize(p["sigma_cp_lines"], scp)
    svm = targets.get("sigma_vm")
    if svm is not None and "sigma_vm_planes" in p:
        p["sigma_vm_planes"], p["sigma_vm_lines"] = vmgrid.resize_vm(
            p["sigma_vm_planes"], p["sigma_vm_lines"], svm)
    return p


def apply_l1_sparsity(model: NerfModel, params: Params, weight: float) -> Params:
    """L1-sparsity grad contribution for the factorized tables — TensoRF's
    second regularizer (loss = weight * mean|table| per component; TensoRF
    §5.1 applies it to the density components to suppress the spurious
    mass factorized grids otherwise grow in free space). Returned as a
    gradient CONTRIBUTION (same contract as apply_total_variation):
    d/dx weight * mean|x| = weight * sign(x) / x.size."""
    c = model.cfg
    if not model.is_mlp_field:
        return {}

    def l1g(t: jax.Array) -> jax.Array:
        return (weight / t.size) * jnp.sign(t)

    g: Params = {}
    for name in ("cp_lines", "vm_planes", "vm_lines",
                 "sigma_cp_lines", "sigma_vm_planes", "sigma_vm_lines"):
        if name not in params:
            continue
        if name == "cp_lines" and c.mlp_cp_rank <= 0:
            continue
        if name in ("vm_planes", "vm_lines") and c.mlp_vm_rank <= 0:
            continue
        t = params[name]
        g[name] = ([l1g(x) for x in t] if isinstance(t, (list, tuple))
                   else l1g(t))
    return g


def apply_weight_decay(model: NerfModel, params: Params, weight: float) -> Params:
    """Level-meaned WD grad for the active grid (network.py:269-275)."""
    c = model.cfg
    if model.is_mlp_field:
        return {}
    if c.with_sam:
        return {"s_grid": hashgrid.grad_weight_decay(params["s_grid"], model.s_grid_spec, weight)}
    if c.with_mask and model.m_grid_spec is not None:
        return {"m_grid": hashgrid.grad_weight_decay(params["m_grid"], model.m_grid_spec, weight)}
    return {"grid": hashgrid.grad_weight_decay(params["grid"], model.grid_spec, weight)}
