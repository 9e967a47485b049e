"""Reference NeRFNetwork checkpoint converter (VERDICT r1 item 5).

Synthetic torch-layout state dicts (the key/shape layout of
/root/reference/nerf/network.py:102-219) round-trip through
convert_nerf_state_dict into the hashgrid-family param tree; converted
params render finite images.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sanerf_tpu.config import ModelConfig, RenderConfig
from sanerf_tpu.models import fields, renderer
from sanerf_tpu.models.convert_nerf import (
    ConversionError, convert_nerf_state_dict,
)

RC = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
MC = ModelConfig(
    field_type="hashgrid",
    grid_num_levels=8, grid_log2_hashmap=13, grid_desired_resolution=128,
    prop_num_levels=4, prop_log2_hashmap=10, prop_resolutions=(64, 128),
)


def _torch_sd(model, rng, with_sam=False, with_mask=False,
              mask_type="default"):
    """Emit the reference's state_dict layout from our spec metadata (the
    table layouts match gridencoder/grid.py by construction)."""
    sd = {}
    c = model.cfg

    def mlp(prefix, layers, bias):
        for l, p in enumerate(layers):
            w = np.asarray(p["w"])
            sd[f"{prefix}.net.{l}.weight"] = rng.standard_normal(
                (w.shape[1], w.shape[0])).astype(np.float32)
            if bias:
                sd[f"{prefix}.net.{l}.bias"] = rng.standard_normal(
                    (w.shape[1],)).astype(np.float32)

    tmpl = fields.init_params(model, jax.random.key(0))
    sd["grid.embeddings"] = rng.standard_normal(
        np.asarray(tmpl["grid"]).shape).astype(np.float32)
    sd["grid.offsets"] = np.zeros((model.grid_spec.num_levels + 1,), np.int32)
    mlp("grid_mlp", tmpl["grid_mlp"], False)
    mlp("view_mlp", tmpl["view_mlp"], False)
    for i, spec in enumerate(model.prop_specs):
        sd[f"prop_encoders.{i}.embeddings"] = rng.standard_normal(
            (spec.total_params, spec.level_dim)).astype(np.float32)
        mlp(f"prop_mlp.{i}", tmpl["prop"][i]["mlp"], False)
    if with_sam:
        sd["s_grid.embeddings"] = rng.standard_normal(
            np.asarray(tmpl["s_grid"]).shape).astype(np.float32)
        mlp("samvit_mlp.0", tmpl["samvit_mlp"], True)
        sd["samvit_mlp.1.weight"] = rng.standard_normal(
            (c.sam_feat_dim,)).astype(np.float32)
        sd["samvit_mlp.1.bias"] = rng.standard_normal(
            (c.sam_feat_dim,)).astype(np.float32)
    if with_mask:
        if mask_type in ("default", "lightweight_mask"):
            sd["m_grid.embeddings"] = rng.standard_normal(
                np.asarray(tmpl["m_grid"]).shape).astype(np.float32)
            pre = "mask_mlp.0" if mask_type == "default" else "mask_mlp"
            mlp(pre, tmpl["mask_mlp"], False)
        else:  # adaptive ladder of bare linears
            for i, p in enumerate(tmpl["mask_mlp"]):
                w = np.asarray(p["w"])
                sd[f"mask_mlp.{i}.weight"] = rng.standard_normal(
                    (w.shape[1], w.shape[0])).astype(np.float32)
    return sd


def test_convert_rgb_checkpoint(rng):
    model = fields.make_model(MC, RC)
    sd = _torch_sd(model, rng)
    keep = {k: v.copy() for k, v in sd.items()}
    params = convert_nerf_state_dict(sd, model)

    # tables copied verbatim; linears transposed
    np.testing.assert_array_equal(np.asarray(params["grid"]),
                                  keep["grid.embeddings"])
    np.testing.assert_array_equal(np.asarray(params["grid_mlp"][1]["w"]),
                                  keep["grid_mlp.net.1.weight"].T)
    np.testing.assert_array_equal(np.asarray(params["prop"][1]["grid"]),
                                  keep["prop_encoders.1.embeddings"])
    np.testing.assert_array_equal(np.asarray(params["prop"][0]["mlp"][1]["w"]),
                                  keep["prop_mlp.0.net.1.weight"].T)

    # converted tree is structurally identical to init_params
    tmpl = fields.init_params(model, jax.random.key(0))
    assert (jax.tree.structure(params) == jax.tree.structure(tmpl))

    # and renders finite output ("render a reference ckpt" recipe)
    ro = jnp.asarray(rng.normal(0, 0.5, (32, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (32, 3)).astype(np.float32))
    out = renderer.render_rays(model, params, ro, rd)
    assert np.isfinite(np.asarray(out["image"])).all()


@pytest.mark.parametrize("mask_type", ["default", "lightweight_mask", "adaptive"])
def test_convert_full_checkpoint(rng, mask_type):
    mc = dataclasses.replace(
        MC, with_sam=True, sam_use_view_direction=True,
        s_grid_num_levels=4, s_grid_log2_hashmap=10,
        s_grid_desired_resolution=64,
        with_mask=True, mask_mlp_type=mask_type, n_inst=3,
    )
    model = fields.make_model(mc, RC)
    if mask_type in ("default", "lightweight_mask"):
        # shrink the m_grid for test speed by reusing the model's spec
        pass
    sd = _torch_sd(model, rng, with_sam=True, with_mask=True,
                   mask_type=mask_type)
    keep = {k: v.copy() for k, v in sd.items()}
    params = convert_nerf_state_dict(sd, model)
    np.testing.assert_array_equal(np.asarray(params["samvit_norm"]["w"]),
                                  keep["samvit_mlp.1.weight"])
    np.testing.assert_array_equal(np.asarray(params["samvit_mlp"][2]["b"]),
                                  keep["samvit_mlp.0.net.2.bias"])
    tmpl = fields.init_params(model, jax.random.key(0))
    assert jax.tree.structure(params) == jax.tree.structure(tmpl)


def test_convert_wrapped_trainer_checkpoint(rng):
    """Reference Trainer checkpoints nest the state_dict under 'model'
    (utils.py:2041-2060)."""
    model = fields.make_model(MC, RC)
    sd = _torch_sd(model, rng)
    params = convert_nerf_state_dict({"model": sd, "epoch": 7}, model)
    assert "grid" in params


def test_convert_errors():
    model = fields.make_model(MC, RC)
    rng = np.random.default_rng(0)
    sd = _torch_sd(model, rng)
    del sd["grid_mlp.net.1.weight"]
    with pytest.raises(ConversionError, match="missing key"):
        convert_nerf_state_dict(sd, model)

    sd = _torch_sd(model, rng)
    sd["grid.embeddings"] = sd["grid.embeddings"][:-8]
    with pytest.raises(ConversionError, match="table shape"):
        convert_nerf_state_dict(sd, model)

    sd = _torch_sd(model, rng)
    sd["mystery.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ConversionError, match="unconsumed"):
        convert_nerf_state_dict(sd, model)

    mlp_model = fields.make_model(
        dataclasses.replace(MC, field_type="mlp"), RC)
    with pytest.raises(ConversionError, match="hashgrid"):
        convert_nerf_state_dict(_torch_sd(model, rng), mlp_model)
