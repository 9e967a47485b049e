"""Typed, frozen configuration objects.

Replaces the reference's single ~90-flag argparse namespace (main.py:15-220)
with per-subsystem frozen dataclasses. Frozen + hashable means configs can be
closed over by `jax.jit` as static data; the reference's runtime-mutation
hacks (adaptive num_rays, multi-res schedules, GUI-editable AABB) become
explicit schedule state threaded through the training loop instead of
mutations of a shared namespace.

Reference flag provenance is cited per-field (file:line into /root/reference).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class RenderConfig:
    """Volume-rendering configuration (reference: main.py:79-97, renderer.py)."""

    # samples per proposal level; last entry is the final NeRF level
    # (main.py:79-80 --num_steps 128 64 32)
    num_steps: Tuple[int, ...] = (128, 64, 32)
    # scene bound; with contraction enabled the grid bound becomes 2
    # (main.py:223 hard override bound=128; renderer.py:149-157)
    bound: float = 128.0
    contract: bool = True
    min_near: float = 0.2  # main.py:69-70
    # 'white' | 'random' | 'last_sample' (main.py:83-84)
    background: str = "last_sample"
    # rays per chunk in staged inference (main.py:86-87)
    max_ray_batch: int = 4096 * 4
    density_thresh: float = 10.0  # main.py:88-89
    # inference-only: run the MLP-family field/prop chains as transposed
    # fused Pallas kernels (ops/fused_mlp_t.py) — activations stay in VMEM
    use_fused_mlp: bool = True
    # let grid-augmented models (ModelConfig.mlp_cp_rank / mlp_vm_rank > 0)
    # compute their CP line / VM plane features INSIDE the fused kernels
    # (one-hot MXU contractions; _cp_block/_vm_block in ops/fused_mlp_t.py).
    # Interpret-mode parity is proven (tests/test_cpgrid.py,
    # tests/test_vmgrid.py) AND the Mosaic lowering is hardware-verified
    # (tools/hw_parity.py, round 4: serving/cp_ladder/vm_ladder shapes all
    # match the XLA path on a v5e chip) — default ON. Oversized tables
    # still auto-route to the XLA path via grid_vmem_budget.
    cp_fused: bool = True
    # point-axis block sizes for the fused transposed kernels (rounded to
    # a multiple of T in-kernel). Tuned at T=32; exposed so the T=24
    # primary hierarchy can re-tune on hardware (tools/ab_flags.py).
    fused_block: int = 4096
    fused_prop_block: int = 16384
    # run the SH encode + per-ray view MLP inside the composite kernel's
    # epilogue (True) or as XLA ops on the composited per-ray sums
    # (False; the composite itself stays fused either way). Measured both
    # ways on a v5e chip with xprof (round 5, tools/trace_frame.py,
    # 512^2 @ (24, 16) on the serving student): in-kernel 32.8 ms/frame
    # (kernel 16.1), XLA view 39.8 ms/frame (kernel drops only to 14.4
    # while jnp sh_encode costs 8.0 ms — its [N, 3]-sliced polynomial
    # ops get 5-14 GB/s layouts). Standalone kernel microbenches say the
    # opposite (tools/kbench.py: view epilogue +5.9 ms at T=16) but the
    # microbench feeds synthetic layouts; the frame profile is the
    # ground truth, so in-kernel stays the default.
    view_in_kernel: bool = True
    # do the [3, N, T] -> [3, N*T] pivot between the ray-geometry kernels
    # and the fused MLP kernels in a VMEM Pallas kernel
    # (ops/ray_kernels.flatten3_nt) instead of XLA's windowed-loop reshape
    # (~4.8 ms/frame at 512^2). Hardware A/B (round 4, tools/ab_flags.py):
    # +12.2 ms/frame vs baseline on a v5e chip — the Pallas transpose
    # chain loses to XLA's reshape; stays off.
    flatten_kernel: bool = False
    # lane-pack the composite kernel's per-ray epilogue: q = 128//T rays
    # (power of two) share one 128-lane row, so the transcendental-heavy
    # weights pipeline runs at ~full lane utilization instead of T/128
    # (~14 ms/frame of per-ray VPU work at 512^2, the largest non-matmul
    # cost). Hardware A/B (round 4, tools/ab_flags.py): +20.4 ms/frame vs
    # baseline on a v5e chip — the packed relayout costs more than the
    # lane under-utilization it recovers; stays off.
    packed_epilogue: bool = False
    # VMEM budget for the cp_fused kernels' grid-table operands (bytes,
    # bf16 accounting — NerfModel.grid_table_bytes). TPU VMEM is ~16 MB/
    # core shared with the packed MLP weights and a [rows, block]
    # activation slab; models whose tables exceed the budget (e.g. the
    # hi-res quality recipe's 1024^2 VM planes, ~48 MB) auto-route to the
    # XLA lookup path — correct, just not fused. Serve those through
    # tools/import_checkpoint.py's distillation into the w128 flagship.
    grid_vmem_budget: int = 6 * 2 ** 20

    @property
    def grid_bound(self) -> float:
        return 2.0 if self.contract else self.bound


@dataclass(frozen=True)
class HashGridConfig:
    """One multiresolution hash grid (reference: gridencoder/grid.py:102-142)."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: Optional[int] = None
    per_level_scale: float = 2.0
    gridtype: str = "hash"  # 'hash' | 'tiled'
    interpolation: str = "linear"  # 'linear' | 'smoothstep'
    align_corners: bool = False


@dataclass(frozen=True)
class ModelConfig:
    """Field architecture (reference: nerf/network.py:94-219).

    `field_type` selects the encoder family:
      - "mlp" (TPU flagship): Fourier features + wide MLPs — pure matmul,
        MXU-shaped, zero gathers. Measured 84 Mpts/s on v5e for the 8x256
        field vs ~3 Mpts/s for the gather-bound hash grid; this is the
        TPU-native re-design of the instant-ngp encoder (a GPU-cache-shaped
        data structure XLA cannot gather from efficiently).
      - "hashgrid": faithful instant-ngp multiresolution hash grid
        (network.py:102), kept for capability parity and reference
        checkpoint conversion.
    """

    field_type: str = "mlp"  # "mlp" | "hashgrid"
    geom_feat_dim: int = 15  # network.py:99
    # --- mlp field family ---
    mlp_enc_freqs: int = 10  # positional-encoding frequencies for the field
    # 128: quality-gated on the adversarial textured fixture at 20k iters —
    # width 128 scored HIGHER held-out PSNR than 256 (14.89 vs 13.78 dB,
    # tools/quality_gate.py; capacity above 128 buys floaters, not detail,
    # at this scene scale) and the field chain is the dominant frame cost
    # (README "Performance"). --mlp_width overrides per run.
    mlp_field_width: int = 128
    mlp_field_depth: int = 8
    # CP-factorized line grid augmenting the field MLP's input (0 = off).
    # TPU-native high-capacity encoder: 1-D line interpolation as one-hot
    # MATMULS (ops/cpgrid.py) — grid capacity without the table gathers
    # that serialize the hashgrid family on this hardware. The fused
    # inference kernels consume it when RenderConfig.cp_fused is set;
    # otherwise cp_rank > 0 renders through the XLA path.
    mlp_cp_rank: int = 0
    mlp_cp_res: int = 256
    # >1 splits the CP rank over a coarse-to-fine resolution ladder ending
    # at mlp_cp_res (the hash grid's multiresolution structure applied to
    # lines; total feature count stays mlp_cp_rank). Requires
    # mlp_cp_rank % mlp_cp_levels == 0.
    mlp_cp_levels: int = 1
    # VM (vector-matrix) factorized grid (0 = off): TensoRF's plane+line
    # mode as one-hot MXU matmuls + a VPU reduction (ops/vmgrid.py) —
    # denser capacity than CP lines for non-axis-aligned detail. Adds
    # 3 * vm_rank features to the field MLP input. Renders through the
    # XLA path (the fused kernels don't consume planes).
    mlp_vm_rank: int = 0
    mlp_vm_res: int = 64
    # >1 splits the VM rank over a coarse-to-fine resolution ladder ending
    # at mlp_vm_res (same structure as mlp_cp_levels; total feature count
    # stays 3 * mlp_vm_rank). Requires mlp_vm_rank % mlp_vm_levels == 0.
    # The fused kernels consume the full ladder in-kernel under cp_fused
    # (one _vm_block per level, coarse -> fine).
    mlp_vm_levels: int = 1
    # DIRECT density grids (TensoRF's core mechanism, arXiv:2203.09517
    # §4.1: sigma is the plain SUM of factorized-grid components — no MLP
    # in the density path, so the photometric gradient reaches the tables
    # undamped). When either rank is > 0, dedicated sigma tables are
    # created and their component-sum is ADDED to the field MLP's density
    # logit (the MLP can learn a residual; at init both are ~0). The
    # sigma tables do NOT feed the MLP input. Single-level; they follow
    # grid_lr_mult, lambda_tv, lambda_l1_grid and grid_upsample_steps
    # (TensoRF applies TV/L1 to the density grid above all).
    mlp_sigma_cp_rank: int = 0
    mlp_sigma_cp_res: int = 256
    mlp_sigma_vm_rank: int = 0
    mlp_sigma_vm_res: int = 128
    # XLA-path lookup primitive for the CP/VM tables ("auto" | "gather" |
    # "onehot"; bit-identical math either way, parity-tested):
    #   - "gather" row-gathers the interpolation corners (6/point CP,
    #     12/point VM). 250x faster on CPU hosts; on TPU gathers serialize
    #     at ~23 M rows/s (tools/probe_gather.py) so it only wins once the
    #     one-hot contraction's 3*R*(R*K) MACs/point outgrow the MXU.
    #   - "onehot" is the iota-compare matmul form (what the fused
    #     inference kernels use in-VMEM, ops/fused_mlp_t.py) — near-free
    #     on the MXU up to TensoRF scale, prohibitive on CPU.
    #   - "auto" (default): gather on CPU; on TPU, onehot for CP lines
    #     (R*K MACs/point is always MXU-cheap) and for VM planes up to
    #     ~4M MACs/point (res 256 x rank 32), gather beyond.
    # The cp_fused inference kernels are unaffected by this knob.
    grid_lookup: str = "auto"
    mlp_prop_enc_freqs: int = 5
    mlp_prop_width: int = 64
    mlp_prop_depth: int = 4
    mlp_sam_width: int = 256
    mlp_sam_depth: int = 4
    mlp_sam_feat_dim: int = 128  # matches s_grid output dim (16 lvl x 8 ch)
    mlp_mask_width: int = 128
    mlp_mask_depth: int = 4
    mlp_mask_feat_dim: int = 128
    # RGB grid: 16 levels x 2ch, 2^19 table, finest 2048*grid_bound (network.py:102)
    grid_num_levels: int = 16
    grid_level_dim: int = 2
    grid_log2_hashmap: int = 19
    grid_desired_resolution: int = 4096  # 2048 * grid_bound(=2)
    grid_mlp_hidden: int = 64
    grid_mlp_layers: int = 3
    # view branch: SH degree 4 -> 16 dims (network.py:106-107)
    sh_degree: int = 4
    view_mlp_hidden: int = 32
    view_mlp_layers: int = 3
    # proposal networks (network.py:206-219)
    prop_num_levels: int = 5
    prop_level_dim: int = 2
    prop_log2_hashmap: int = 17
    prop_resolutions: Tuple[int, ...] = (128, 256)
    prop_mlp_hidden: int = 16
    prop_mlp_layers: int = 2

    # --- SAM feature field (network.py:110-123) ---
    with_sam: bool = False
    sam_feat_dim: int = 256
    s_grid_num_levels: int = 16
    s_grid_level_dim: int = 8
    s_grid_log2_hashmap: int = 19
    s_grid_desired_resolution: int = 512
    samvit_mlp_hidden: int = 256
    samvit_mlp_layers: int = 5
    samvit_skip_layers: Tuple[int, ...] = (2,)
    sam_use_view_direction: bool = False  # main.py:31-32
    sum_after_mlp: bool = False  # main.py:145-146

    # --- mask field (network.py:125-203) ---
    with_mask: bool = False
    mask_mlp_type: str = "default"  # 'default' | 'lightweight_mask' | 'adaptive'
    adaptive_mlp_type: str = "density"  # 'density' | 'rgb' | 'sam' (main.py:147-148)
    n_inst: int = 2  # main.py:116-117
    redundant_instance: int = 0  # main.py:143-144


@dataclass(frozen=True)
class TrainConfig:
    """Optimization configuration (reference: main.py:75-109, 296-318)."""

    iters: int = 20000
    lr: float = 1e-2
    lr_warmup_steps: int = 0  # linear warmup (0 = reference behavior)
    grad_clip: float = 1.0  # global-norm clip (0 disables)
    adam_eps: float = 1e-15  # main.py:296
    # lr multiplier for factorized-grid tables (CP lines / VM planes):
    # TensoRF's grid-vs-net split; measured +1.1 dB on the CP
    # import-distillation student. 1.0 = single lr (hash grids always
    # train at the single reference lr regardless).
    grid_lr_mult: float = 10.0
    ema_decay: float = 0.95  # main.py:316
    # ray-batch budget: num_rays adaptively scaled so that final-level points
    # ~= num_points (main.py:92-97, utils.py:932-935). TPU build uses a fixed
    # ray count per compiled program; buckets quantize the adaptation.
    num_rays: int = 4096
    adaptive_num_rays: bool = True
    num_points: int = 2**18
    # loss weights (main.py:100-109)
    lambda_entropy: float = 0.0
    lambda_tv: float = 0.0
    # L1 sparsity on the factorized CP/VM tables (TensoRF §5.1 — suppress
    # spurious mass in free space; mlp family only)
    lambda_l1_grid: float = 0.0
    # TensoRF §5.2 coarse-to-fine: CP/VM tables start at final_res >> N
    # and double at each of these global-step milestones (applied at epoch
    # boundaries; optimizer state resets at each, TensoRF's lr restart)
    grid_upsample_steps: Tuple[int, ...] = ()
    lambda_wd: float = 0.0
    lambda_proposal: float = 1.0
    lambda_distort: float = 0.02
    # proposal-update schedule (utils.py:910-911)
    prop_warmup_steps: int = 3000
    prop_update_every: int = 5
    # coarse-to-fine annealing for the MLP family's encode (BARF,
    # arXiv:2104.06405): over the first `anneal_iters` steps the PE bands
    # (and multi-res CP levels) open coarse-to-fine — the classic held-out
    # floater control for coordinate/grid fields trained from sparse views.
    # 0 = off (reference behavior; the hashgrid family ignores it).
    anneal_iters: int = 0
    # prefer the native (C++) prefetching ray sampler for plain RGB batches
    use_native_loader: bool = True
    # data-parallel device count: >1 wraps the canonical train step in
    # shard_map over a 1-D mesh (grads pmean over ICI) and shards eval
    # renders (SURVEY.md §2.3; replaces the vestigial DDP of utils.py:596-599)
    n_devices: int = 1
    # checkpoint / eval cadence (main.py:40-43)
    save_cnt: int = 20
    eval_cnt: int = 5
    max_keep_ckpt: int = 2  # utils.py:553-554


@dataclass(frozen=True)
class SamTrainConfig:
    """Stage-2 SAM-feature distillation (reference: main.py:23-37)."""

    online_resolution: int = 512  # main.py:29-30
    cache_size: int = 256  # main.py:34-35
    cache_interval: int = 4  # main.py:36-37
    sam_ckpt: str = "./pretrained/sam_vit_h_4b8939.pth"
    # camera augmentation: random fovy in [50, 70] deg at train
    # (colmap_provider.py:989-1004), fixed 60 at eval
    fovy_range: Tuple[float, float] = (50.0, 70.0)
    eval_fovy: float = 60.0
    # LERF-style slerp augmentation between two random train poses
    # (lerf_provider.py:261-278, main.py:122 --pose_jittering)
    pose_jittering: bool = False


@dataclass(frozen=True)
class MaskTrainConfig:
    """Stage-3 mask-field training (reference: main.py:112-177)."""

    label_regularization_weight: float = 0.0
    patch_size: int = 1
    incoherent_uncertainty_weight: float = 1.0
    rgb_similarity_loss_weight: float = 0.0
    rgb_similarity_threshold: float = 0.3
    epsilon: float = 1e-6
    rgb_similarity_exp_weight: float = 10.0
    rgb_similarity_num_sample: int = 1
    rgb_similarity_iter: int = -1
    rgb_similarity_use_pred_logistics: bool = False
    mixed_sampling: bool = False
    local_sample_patch_size: int = 16
    num_local_sample: int = 2
    error_map: bool = False
    error_map_size: int = 128
    use_multi_res: bool = False
    multi_res_update_iter: int = 100
    max_multi_res_level: int = 2
    use_dynamic_incoherent: bool = False
    incoherent_update_iter: int = 50
    incoherent_downsample_scale: int = 1
    mask_folder_name: Optional[str] = None


@dataclass(frozen=True)
class DataConfig:
    """Dataset configuration (reference: main.py:49-72, 212-217)."""

    path: str = "."
    data_type: str = "mip"  # mip | lerf | llff | 3dfront | ctr | pano | lift
    train_split: str = "train"
    test_split: str = "val"
    val_type: str = "default"  # default | val_all | val_split (main.py:189)
    downscale: int = 1
    scale: float = -1.0
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    enable_cam_near_far: bool = False
    enable_cam_center: bool = False
    random_image_batch: bool = False
    preload: bool = True
    camera_traj: str = "interp"  # interp | circle (main.py:45-46)
    scene_name: str = "garden"
    object_name: str = "table_whole"


@dataclass(frozen=True)
class Config:
    """Top-level bundle threaded through the framework."""

    workspace: str = "workspace"
    seed: int = 0
    ckpt: str = "latest"  # latest | latest_model | best | scratch | <path>
    init_ckpt: str = ""
    test: bool = False
    gui: bool = False
    # mask render visualization (main.py:193-197)
    render_mask_type: str = "heatmap"  # mask | composition | heatmap
    render_mask_instance_id: int = 0
    use_wandb: bool = False  # opt-in wandb logging (main.py:320-321)
    render: RenderConfig = field(default_factory=RenderConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    sam: SamTrainConfig = field(default_factory=SamTrainConfig)
    mask: MaskTrainConfig = field(default_factory=MaskTrainConfig)
    data: DataConfig = field(default_factory=DataConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def replace(cfg, **kw):
    """dataclasses.replace that works on any of the frozen configs."""
    return dataclasses.replace(cfg, **kw)


def config_from_dict(cls, d: dict):
    """Rebuild a frozen config from a JSON dict (dataclasses.asdict round
    trip): JSON turns tuples into lists, so list values land on
    tuple-typed fields as tuples again. Unknown keys are ignored so old
    serialized configs keep loading after fields are added."""
    names = {f.name: f for f in dataclasses.fields(cls)}
    kw = {}
    for k, v in d.items():
        if k not in names:
            continue
        kw[k] = tuple(v) if isinstance(v, list) else v
    return cls(**kw)
