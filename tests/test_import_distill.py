"""Import-time distillation of hash-grid checkpoints into the MLP family."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_tpu.config import ModelConfig, RenderConfig
from sanerf_tpu.models import fields, import_distill


def _tiny_models(with_sam=False, with_mask=False, mask_type="default"):
    rc = RenderConfig(num_steps=(16, 8), bound=2.0, contract=True,
                      min_near=0.05)
    mc = ModelConfig(
        field_type="hashgrid",
        # log2_hashmap 13 >= 16^3: every level is TILED (exact dense
        # indexing) so _smooth_tables below constructs a spatially smooth
        # teacher, like a real trained checkpoint — random tables are
        # unfittable noise by construction
        grid_num_levels=4, grid_log2_hashmap=13, grid_desired_resolution=16,
        prop_num_levels=2, prop_log2_hashmap=13, prop_resolutions=(8, 16),
        mlp_field_width=64, mlp_field_depth=4,
        with_sam=with_sam, with_mask=with_mask, mask_mlp_type=mask_type,
        s_grid_num_levels=4, s_grid_log2_hashmap=8,
        s_grid_desired_resolution=64,
        n_inst=3,
    )
    teacher = fields.make_model(mc, rc)
    return teacher, fields.init_params(teacher, jax.random.key(3))


def _smooth_tables(spec, seed=0):
    """Table whose virtual dense grid per level samples a smooth function —
    the structure real trained hash grids have."""
    from sanerf_tpu.ops.hashgrid import _grid_index

    rng = np.random.RandomState(seed)
    table = np.zeros((spec.total_params, spec.level_dim), np.float32)
    for lvl, res in enumerate(spec.resolutions):
        ii, jj, kk = np.meshgrid(*([np.arange(res)] * 3), indexing="ij")
        pos = tuple(a.ravel().astype(np.int32) for a in (ii, jj, kk))
        idx = np.asarray(_grid_index(spec, lvl, tuple(
            jnp.asarray(p) for p in pos))) + spec.offsets[lvl]
        xyz = np.stack([p / max(res - 1, 1) for p in pos], -1)  # [V, 3]
        freqs = rng.uniform(1.0, 4.0, (3, spec.level_dim))
        phase = rng.uniform(0, 2 * np.pi, spec.level_dim)
        vals = np.sin(xyz @ freqs * np.pi + phase).astype(np.float32)
        table[idx] = 0.5 * vals
    return jnp.asarray(table)


def test_student_config_flips_family_and_matches_dims():
    teacher, _ = _tiny_models(with_sam=True)
    scfg = import_distill.student_config(teacher.cfg)
    assert scfg.field_type == "mlp"
    student = fields.make_model(scfg, teacher.render_cfg)
    assert student.s_feat_dim == teacher.s_feat_dim
    assert student.color_dim == teacher.color_dim
    assert student.samvit_in_dim == teacher.samvit_in_dim


def test_distill_fits_field_and_copies_heads():
    teacher, tparams = _tiny_models()
    tparams["grid"] = _smooth_tables(teacher.grid_spec, seed=1)
    for i, p in enumerate(tparams["prop"]):
        p["grid"] = _smooth_tables(teacher.prop_specs[i], seed=2 + i)
    sm, sp, report = import_distill.distill_to_mlp(
        teacher, tparams, key=jax.random.key(0),
        n_points=1 << 14, batch=512, iters=800, render_check=1,
        render_hw=24)
    # identical-structure heads are copied bit-for-bit
    for a, b in zip(jax.tree.leaves(sp["view_mlp"]),
                    jax.tree.leaves(tparams["view_mlp"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the fit converged on the field (random tiny tables are still smooth
    # trilinear functions; the MLP must track them meaningfully)
    x = jax.random.uniform(jax.random.key(1), (4096, 3), minval=-1, maxval=1)
    t = import_distill._teacher_field(teacher, tparams, x)
    s = import_distill._student_field(sm, sp, x)
    # density in the cross-family matching space; features raw
    tc = jnp.concatenate(
        [import_distill._log_density(t[:, :1], False), t[:, 1:]], -1)
    sc = jnp.concatenate(
        [import_distill._log_density(s[:, :1], True), s[:, 1:]], -1)
    resid = float(jnp.mean((sc - tc) ** 2))
    base = float(jnp.mean((tc - jnp.mean(tc, axis=0)) ** 2))
    # the meaningful fidelity gate is render_psnr below; this only checks
    # the fit moved substantially toward the teacher in matching space
    assert resid < 0.75 * base, (resid, base)
    assert np.isfinite(report["render_psnr"])
    assert report["render_psnr"] > 20.0, report


def test_distill_sam_and_mask_targets_present():
    teacher, tparams = _tiny_models(with_sam=True, with_mask=True,
                                    mask_type="lightweight_mask")
    x, targets = import_distill.build_targets(
        teacher, tparams, jax.random.key(0), n_points=1 << 10)
    assert set(targets) == {"field", "prop0", "prop1", "sam", "mask"}
    assert targets["sam"].shape[-1] == teacher.s_feat_dim
    assert targets["mask"].shape[-1] == teacher.m_feat_dim
    sm, sp, _ = import_distill.distill_to_mlp(
        teacher, tparams, key=jax.random.key(0),
        n_points=1 << 11, batch=256, iters=16, render_check=0)
    assert "s_field_mlp" in sp and "m_field_mlp" in sp
    # the student renders through the standard staged path with SAM head
    from sanerf_tpu.models import renderer
    o = jnp.zeros((64, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (64, 1))
    out = renderer.render_staged(sm, sp, o, d, return_feats=True)
    assert np.isfinite(np.asarray(out["samvit"])).all()


def test_distill_to_cp_student():
    """A CP-augmented student fits the hash-grid teacher at least as well
    as the plain MLP student (it strictly contains it) and trains its
    line tables."""
    teacher, tparams = _tiny_models()
    tparams["grid"] = _smooth_tables(teacher.grid_spec, seed=7)
    for i, p in enumerate(tparams["prop"]):
        p["grid"] = _smooth_tables(teacher.prop_specs[i], seed=8 + i)
    scfg = import_distill.student_config(teacher.cfg, cp_rank=8, cp_res=16)
    student = fields.make_model(scfg, teacher.render_cfg)
    sm, sp, report = import_distill.distill_to_mlp(
        teacher, tparams, key=jax.random.key(0), student_model=student,
        n_points=1 << 13, batch=512, iters=200, render_check=0)
    assert sm.cfg.mlp_cp_rank == 8
    assert "cp_lines" in sp
    init = fields.init_params(sm, jax.random.key(0))
    # the line tables moved (they are part of the fit)
    assert float(jnp.abs(sp["cp_lines"] - init["cp_lines"]).max()) > 0
    assert np.isfinite(report["losses"]["field"])


def test_distill_to_vm_student():
    """A VM-augmented student (TensoRF plane+line grid) distills and
    trains its planes under the split-lr optimizer."""
    teacher, tparams = _tiny_models()
    tparams["grid"] = _smooth_tables(teacher.grid_spec, seed=7)
    for i, p in enumerate(tparams["prop"]):
        p["grid"] = _smooth_tables(teacher.prop_specs[i], seed=8 + i)
    scfg = import_distill.student_config(teacher.cfg, vm_rank=4, vm_res=8)
    student = fields.make_model(scfg, teacher.render_cfg)
    sm, sp, report = import_distill.distill_to_mlp(
        teacher, tparams, key=jax.random.key(0), student_model=student,
        n_points=1 << 13, batch=512, iters=200, render_check=0)
    assert sm.cfg.mlp_vm_rank == 4
    init = fields.init_params(sm, jax.random.key(0))
    for k in ("vm_planes", "vm_lines"):
        assert float(jnp.abs(sp[k] - init[k]).max()) > 0, k
    assert np.isfinite(report["losses"]["field"])


def test_distill_to_sigma_grid_shallow_student():
    """The measured-best grid student shape — shallow decoder + DIRECT-
    density sigma tables: depth override lands, sigma tables join the
    split-lr fit, and _student_field distills the SAME density function
    inference serves (logit includes sigma_grid_logit)."""
    teacher, tparams = _tiny_models()
    tparams["grid"] = _smooth_tables(teacher.grid_spec, seed=7)
    for i, p in enumerate(tparams["prop"]):
        p["grid"] = _smooth_tables(teacher.prop_specs[i], seed=8 + i)
    scfg = import_distill.student_config(
        teacher.cfg, cp_rank=8, cp_res=16, sigma_cp_rank=4, sigma_cp_res=16,
        depth=3)
    assert scfg.mlp_field_depth == 3
    student = fields.make_model(scfg, teacher.render_cfg)
    sm, sp, report = import_distill.distill_to_mlp(
        teacher, tparams, key=jax.random.key(0), student_model=student,
        n_points=1 << 13, batch=512, iters=200, render_check=0)
    init = fields.init_params(sm, jax.random.key(0))
    assert float(jnp.abs(sp["sigma_cp_lines"] - init["sigma_cp_lines"]).max()) > 0
    assert np.isfinite(report["losses"]["field"])
    # distilled function == served function at random points
    x = jax.random.uniform(jax.random.key(5), (128, 3), minval=-1.5,
                           maxval=1.5)
    f = import_distill._student_field(sm, sp, x)
    sig_served, _, _, _ = fields.common_forward(sm, sp, x)
    sig_distilled = fields.density_activation(sm, f[..., 0])
    np.testing.assert_allclose(np.asarray(sig_distilled),
                               np.asarray(sig_served), rtol=1e-5, atol=1e-6)


def test_serving_distill_from_grid_teacher():
    """MLP-family (grid-augmented) teacher -> tables-stripped serving
    student: the same distillation machinery fits the quality recipe into
    a fused-path student (tools/distill_serving.py's core). The teacher's
    density decodes under ITS OWN activation (shifted-softplus), and the
    default student strips the tables but keeps every head dim."""
    rc = RenderConfig(num_steps=(16, 8), bound=2.0, contract=True,
                      min_near=0.05)
    tc = ModelConfig(field_type="mlp", mlp_cp_rank=8, mlp_cp_res=32,
                     mlp_sigma_cp_rank=4, mlp_sigma_cp_res=32,
                     mlp_field_width=32, mlp_field_depth=3,
                     mlp_enc_freqs=4, mlp_prop_enc_freqs=3,
                     mlp_prop_width=16, mlp_prop_depth=2,
                     prop_resolutions=(8, 16))
    teacher = fields.make_model(tc, rc)
    tparams = fields.init_params(teacher, jax.random.key(1))
    # give the tables real content so there is something to fit
    tparams["cp_lines"] = 0.5 * jax.random.normal(
        jax.random.key(2), tparams["cp_lines"].shape)
    sm, sp, report = import_distill.distill_to_mlp(
        teacher, tparams, key=jax.random.key(0),
        n_points=1 << 13, batch=512, iters=300, render_check=0)
    # default serving student: same family, tables stripped
    assert sm.is_mlp_field
    assert sm.cfg.mlp_cp_rank == 0 and sm.cfg.mlp_sigma_cp_rank == 0
    assert "cp_lines" not in sp and "sigma_cp_lines" not in sp
    assert sm.cfg.mlp_field_width == tc.mlp_field_width
    assert np.isfinite(report["losses"]["field"])
    # the fit actually tracks the teacher's density field
    x = jax.random.uniform(jax.random.key(5), (512, 3), minval=-1.5,
                           maxval=1.5)
    t_sig = fields.density_activation(
        teacher, import_distill._teacher_field(teacher, tparams, x)[..., 0])
    s_sig = fields.density_activation(
        sm, import_distill._student_field(sm, sp, x)[..., 0])
    init_sp = fields.init_params(sm, jax.random.key(9))
    s0_sig = fields.density_activation(
        sm, import_distill._student_field(sm, init_sp, x)[..., 0])
    # compare in the matched (log1p) space
    lt = np.log1p(np.asarray(t_sig))
    err = np.mean((lt - np.log1p(np.asarray(s_sig))) ** 2)
    err0 = np.mean((lt - np.log1p(np.asarray(s0_sig))) ** 2)
    assert err < err0, (err, err0)
