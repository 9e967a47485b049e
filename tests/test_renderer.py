"""Renderer tests: shapes, staged-vs-direct equivalence, gradient flow,
and physical sanity on a synthetic constant-density field."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sanerf_tpu.config import ModelConfig, RenderConfig
from sanerf_tpu.models import fields, renderer

TINY_RENDER = RenderConfig(num_steps=(16, 8), bound=4.0, contract=True, max_ray_batch=32)
TINY_MODEL = ModelConfig(
    field_type="hashgrid",
    grid_num_levels=4, grid_log2_hashmap=10, grid_desired_resolution=64,
    prop_num_levels=3, prop_log2_hashmap=8, prop_resolutions=(32,),
    s_grid_num_levels=4, s_grid_log2_hashmap=10, s_grid_desired_resolution=64,
)
TINY_MLP_MODEL = ModelConfig(
    field_type="mlp", prop_resolutions=(32,),
    mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
    mlp_prop_enc_freqs=3, mlp_prop_width=16, mlp_prop_depth=2,
    mlp_sam_width=32, mlp_sam_depth=2, mlp_mask_width=32, mlp_mask_depth=2,
)


def _rays(n, rng):
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -3.0
    d = rng.normal(0, 0.1, (n, 3)).astype(np.float32)
    d[:, 2] = 1.0
    return jnp.asarray(o), jnp.asarray(d)


def _build(mc=TINY_MODEL, rc=TINY_RENDER, seed=0):
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(seed))
    return model, params


@pytest.mark.parametrize("mc", [TINY_MODEL, TINY_MLP_MODEL],
                         ids=["hashgrid", "mlp"])
def test_rgb_shapes_and_finiteness(mc, rng):
    model, params = _build(mc)
    ro, rd = _rays(17, rng)
    out = renderer.render_rays(model, params, ro, rd, jax.random.key(1),
                            training=True, perturb=True)
    assert out["image"].shape == (17, 3)
    assert out["depth"].shape == (17,)
    assert out["weights_sum"].shape == (17,)
    assert out["weights"].shape == (17, 8)
    for k in ("image", "depth", "weights_sum", "proposal_loss", "distort_loss"):
        assert np.all(np.isfinite(np.asarray(out[k]))), k
    ws = np.asarray(out["weights_sum"])
    assert np.all((ws >= 0) & (ws <= 1 + 1e-5))


def test_opaque_background_weights_sum_to_one(rng):
    model, params = _build()
    ro, rd = _rays(9, rng)
    out = renderer.render_rays(model, params, ro, rd)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]), 1.0, atol=1e-5)


def test_white_background_blend(rng):
    rc = dataclasses.replace(TINY_RENDER, background="white")
    model, params = _build(rc=rc)
    ro, rd = _rays(9, rng)
    out = renderer.render_rays(model, params, ro, rd, bg_color=1.0)
    img = np.asarray(out["image"])
    assert np.all((img >= 0) & (img <= 1 + 1e-4))


def test_staged_matches_direct(rng):
    model, params = _build()
    ro, rd = _rays(70, rng)  # > 2 chunks of 32 with a ragged tail
    direct = renderer.render_rays(model, params, ro, rd)
    staged = renderer.render_staged(model, params, ro, rd, chunk=32)
    for k in ("image", "depth", "weights_sum"):
        np.testing.assert_allclose(
            np.asarray(staged[k]), np.asarray(direct[k]), rtol=1e-4, atol=1e-5
        )


def test_gradients_flow_to_all_rgb_params(rng):
    model, params = _build()
    ro, rd = _rays(8, rng)

    def loss_fn(p):
        out = renderer.render_rays(model, p, ro, rd, jax.random.key(0),
                                training=True, perturb=True)
        return (
            jnp.mean(out["image"] ** 2)
            + out["proposal_loss"]
            + out["distort_loss"]
        )

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    for path, g in flat:
        assert np.all(np.isfinite(np.asarray(g))), path
    # every major param group receives gradient signal
    assert float(jnp.sum(jnp.abs(grads["grid"]))) > 0
    assert float(jnp.sum(jnp.abs(grads["grid_mlp"][0]["w"]))) > 0
    assert float(jnp.sum(jnp.abs(grads["view_mlp"][0]["w"]))) > 0
    for prop in grads["prop"]:
        assert float(jnp.sum(jnp.abs(prop["grid"]))) > 0


def test_update_proposal_false_freezes_props(rng):
    model, params = _build()
    ro, rd = _rays(8, rng)

    def loss_fn(p):
        out = renderer.render_rays(model, p, ro, rd, training=True,
                                update_proposal=False)
        return jnp.mean(out["image"] ** 2) + out["distort_loss"]

    grads = jax.grad(loss_fn)(params)
    for prop in grads["prop"]:
        assert float(jnp.sum(jnp.abs(prop["grid"]))) == 0.0


@pytest.mark.parametrize("base", [TINY_MODEL, TINY_MLP_MODEL], ids=["hashgrid", "mlp"])
@pytest.mark.parametrize("use_view_dir,sum_after", [(True, False), (False, False),
                                                    (True, True), (False, True)])
def test_sam_head_variants(base, use_view_dir, sum_after, rng):
    mc = dataclasses.replace(base, with_sam=True,
                             sam_use_view_direction=use_view_dir,
                             sum_after_mlp=sum_after)
    model, params = _build(mc)
    ro, rd = _rays(6, rng)
    out = renderer.render_rays(model, params, ro, rd, return_feats=True)
    assert out["samvit"].shape == (6, 256)
    assert np.all(np.isfinite(np.asarray(out["samvit"])))


@pytest.mark.parametrize("base", [TINY_MODEL, TINY_MLP_MODEL], ids=["hashgrid", "mlp"])
@pytest.mark.parametrize("mask_type,adaptive_type,sum_after", [
    ("default", "density", False),
    ("lightweight_mask", "density", False),
    ("adaptive", "density", True),
    ("adaptive", "rgb", True),
    ("adaptive", "sam", True),
])
def test_mask_head_variants(base, mask_type, adaptive_type, sum_after, rng):
    mc = dataclasses.replace(
        base, with_mask=True, mask_mlp_type=mask_type,
        adaptive_mlp_type=adaptive_type, n_inst=3, sum_after_mlp=sum_after,
        with_sam=(adaptive_type == "sam"),
        sam_use_view_direction=(adaptive_type == "sam"),
    )
    model, params = _build(mc)
    ro, rd = _rays(6, rng)
    out = renderer.render_rays(model, params, ro, rd, return_mask=True)
    assert out["instance_mask_logits"].shape == (6, 3)
    assert np.all(np.isfinite(np.asarray(out["instance_mask_logits"])))


def test_mask_logits_weights_detached(rng):
    """Mask loss must not backprop into the density branch
    (renderer.py:453-454 detaches weights)."""
    mc = dataclasses.replace(TINY_MODEL, with_mask=True, mask_mlp_type="default",
                             n_inst=2)
    model, params = _build(mc)
    ro, rd = _rays(6, rng)

    def loss_fn(p):
        out = renderer.render_rays(model, p, ro, rd, return_mask=True)
        return jnp.mean(out["instance_mask_logits"] ** 2)

    grads = jax.grad(loss_fn)(params)
    assert float(jnp.sum(jnp.abs(grads["grid"]))) == 0.0  # density frozen
    assert float(jnp.sum(jnp.abs(grads["m_grid"]))) > 0
    assert float(jnp.sum(jnp.abs(grads["mask_mlp"][0]["w"]))) > 0


def test_cam_near_far_clamps_depth(rng):
    model, params = _build()
    ro, rd = _rays(5, rng)
    cnf = jnp.asarray([[2.0, 2.5]] * 5)
    out = renderer.render_rays(model, params, ro, rd, cam_near_far=cnf)
    d = np.asarray(out["depth"])
    ws = np.asarray(out["weights_sum"])
    # depth = sum w*t with t inside [2, 2.5]
    assert np.all(d >= 2.0 * ws - 1e-3)
    assert np.all(d <= 2.5 * ws + 1e-3)


def test_mlp_field_gradients_flow(rng):
    model, params = _build(TINY_MLP_MODEL)
    ro, rd = _rays(8, rng)

    def loss_fn(p):
        out = renderer.render_rays(model, p, ro, rd, jax.random.key(0),
                                   training=True, perturb=True)
        return jnp.mean(out["image"] ** 2) + out["proposal_loss"] + out["distort_loss"]

    grads = jax.grad(loss_fn)(params)
    assert "grid" not in grads  # no tables in the mlp family
    assert float(jnp.sum(jnp.abs(grads["grid_mlp"][0]["w"]))) > 0
    assert float(jnp.sum(jnp.abs(grads["view_mlp"][0]["w"]))) > 0
    for prop in grads["prop"]:
        assert float(jnp.sum(jnp.abs(prop["mlp"][0]["w"]))) > 0
