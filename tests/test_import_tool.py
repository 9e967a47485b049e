"""tools/import_checkpoint.py end-to-end: reference .pth -> workspace ckpt.

Uses the synthetic torch-layout state dict machinery from
tests/test_convert_nerf.py, saved through real `torch.save`, driven
through the tool's CLI entry — the exact path a user of a reference
checkpoint runs (SURVEY.md §7 hard part 5)."""

import json

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sanerf_tpu.config import ModelConfig, RenderConfig
from sanerf_tpu.models import fields
from sanerf_tpu.train.checkpoints import CheckpointManager, unflatten_like
from tests.test_convert_nerf import MC, RC, _torch_sd


@pytest.fixture
def pth_file(tmp_path):
    model = fields.make_model(MC, RC)
    rng = np.random.RandomState(0)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in _torch_sd(model, rng).items()}
    path = tmp_path / "ngp_ep0100.pth"
    torch.save({"model": sd, "epoch": 100}, str(path))
    return str(path)


def _tool_main(argv, monkeypatch):
    """Run the tool with the test-sized model config in place of the
    full reference-sized default (the tool's config mirrors the .pth)."""
    import tools.import_checkpoint as tool

    real_mc = ModelConfig

    def sized_mc(**kw):
        base = {f: getattr(MC, f) for f in (
            "grid_num_levels", "grid_log2_hashmap", "grid_desired_resolution",
            "prop_num_levels", "prop_log2_hashmap", "prop_resolutions")}
        base.update(kw)
        return real_mc(**base)

    monkeypatch.setattr(tool, "ModelConfig", sized_mc)
    monkeypatch.setattr(tool, "RenderConfig",
                        lambda **kw: RC)
    return tool.main(argv)


def test_import_keep_hashgrid(pth_file, tmp_path, monkeypatch, capsys):
    ws = str(tmp_path / "ws_hg")
    _tool_main([pth_file, "--workspace", ws, "--keep_hashgrid"], monkeypatch)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["family"] == "hashgrid"
    model = fields.make_model(MC, RC)
    tmpl = fields.init_params(model, jax.random.key(0))
    flat, _ = CheckpointManager.load_file(out["checkpoint"])
    params = unflatten_like(tmpl, flat, "params/")
    # the conversion is bit-exact: table row 0 matches the torch tensor
    obj = torch.load(pth_file, weights_only=True)["model"]
    np.testing.assert_array_equal(
        np.asarray(params["grid"])[:8],
        obj["grid.embeddings"].numpy()[:8])


def test_import_distills_to_mlp(pth_file, tmp_path, monkeypatch, capsys):
    ws = str(tmp_path / "ws_mlp")
    _tool_main([pth_file, "--workspace", ws, "--iters", "4",
                "--n_points", "2048", "--batch", "256",
                "--render_check", "0"], monkeypatch)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["family"] == "mlp"
    assert "field" in out["losses"]
    # loadable as the MLP-family flagship
    smc = ModelConfig(field_type="mlp")
    smodel = fields.make_model(smc, RC)
    tmpl = fields.init_params(smodel, jax.random.key(0))
    flat, _ = CheckpointManager.load_file(out["checkpoint"])
    params = unflatten_like(tmpl, flat, "params/")
    # view head copied verbatim from the converted teacher
    obj = torch.load(pth_file, weights_only=True)["model"]
    np.testing.assert_allclose(
        np.asarray(params["view_mlp"][0]["w"]),
        obj["view_mlp.net.0.weight"].numpy().T, rtol=1e-6)


def test_distill_serving_tool(tmp_path):
    """tools/distill_serving.py end-to-end: a grid-augmented workspace
    checkpoint distills into a tables-stripped serving checkpoint (the
    quality->serving split for models over the VMEM budget)."""
    import os

    import tools.distill_serving as tool
    from sanerf_tpu.apps.main import build_parser, config_from_args

    ws = str(tmp_path / "teacher_ws")
    flags = ["dummy_path", "--workspace", ws,
             "--cp_rank", "8", "--cp_res", "32",
             "--sigma_cp_rank", "4", "--sigma_cp_res", "32",
             "--mlp_depth", "3"]
    cfg = config_from_args(build_parser().parse_known_args(flags)[0])
    model = fields.make_model(cfg.model, cfg.render)
    params = fields.init_params(model, jax.random.key(0))
    CheckpointManager(ws, name="ngp").save(5, params, ema_params=params,
                                           full=False)
    out_ws = str(tmp_path / "serve_ws")
    tool.main(flags + ["--out_workspace", out_ws,
                       "--distill_iters", "60",
                       "--distill_points", str(1 << 12),
                       "--distill_batch", "256", "--render_check", "0"])
    saved = os.listdir(os.path.join(out_ws, "checkpoints"))
    assert any(f.endswith(".npz") for f in saved), saved
