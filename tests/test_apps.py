"""Application-layer tests: interactive loop, CLI end-to-end, evaluation
harness, automatic mask generator, label projection."""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from sanerf_tpu.apps import evaluation
from sanerf_tpu.apps.auto_generator import (
    AutomaticMaskGenerator, box_nms, build_point_grid, mask_to_rle, rle_to_mask,
)
from sanerf_tpu.apps.interactive import InteractiveSession
from sanerf_tpu.apps.sam_project import generate_masks, project_to_2d, project_to_3d
from sanerf_tpu.config import Config, ModelConfig, RenderConfig, TrainConfig
from sanerf_tpu.data.synthetic import SyntheticSphereDataset
from sanerf_tpu.models import fields

RC = RenderConfig(num_steps=(12, 6), bound=4.0, contract=True, max_ray_batch=8192)
MC = ModelConfig(field_type="mlp", prop_resolutions=(32,), with_sam=True,
                 sam_use_view_direction=True,
                 mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                 mlp_prop_enc_freqs=3, mlp_prop_width=16, mlp_prop_depth=2,
                 mlp_sam_width=32, mlp_sam_depth=2, mlp_sam_feat_dim=32,
                 sam_feat_dim=32, samvit_mlp_hidden=32)


def _tiny_sam():
    from tests.test_sam import TINY_SAM
    from sanerf_tpu.models.sam import predictor

    params = predictor.init_params(TINY_SAM, jax.random.key(0))
    cfg = dataclasses.replace(TINY_SAM, decoder=dataclasses.replace(
        TINY_SAM.decoder, embed_dim=32))
    return predictor.SamPredictor(TINY_SAM, params)


@pytest.fixture(scope="module")
def session():
    model = fields.make_model(MC, RC)
    params = fields.init_params(model, jax.random.key(0))
    cfg = Config(render=RC, model=MC)
    # session at 64x64 with the tiny SAM (whose feature dim is 32 -> the
    # NeRF sam head must emit 32 channels; set via sam_feat_dim above)
    return InteractiveSession(cfg, model, params, _tiny_sam(), H=64, W=64)


def test_interactive_click_and_segment(session):
    ds = SyntheticSphereDataset(H=64, W=64, n_views=2)
    pose = ds.poses[0]
    intr = session.intrinsics_for(pose)

    # frame without clicks: rgb + depth only
    r0 = session.step(pose, intr)
    assert r0.rgb.shape == (64, 64, 3) and r0.mask is None

    # click at the center: a 3D point is remembered; segmentation runs
    r1 = session.step(pose, intr, click=(32, 32))
    assert len(session.points_3d) == 1
    assert r1.mask is not None and r1.mask.shape == (64, 64)
    assert r1.points_2d.shape[0] == 1
    # reprojected click lands near the click
    assert abs(r1.points_2d[0][0] - 32) < 2 and abs(r1.points_2d[0][1] - 32) < 2

    # second click at the same spot toggles the point OFF
    session.step(pose, intr, click=(float(r1.points_2d[0][0]),
                                    float(r1.points_2d[0][1])))
    assert len(session.points_3d) == 0


def test_interactive_point_persists_across_views(session):
    ds = SyntheticSphereDataset(H=64, W=64, n_views=8)
    session.points_3d.clear()
    r = session.step(ds.poses[0], session.intrinsics_for(ds.poses[0]),
                     click=(32, 32))
    assert len(session.points_3d) == 1
    # neighboring view: the same 3D point reprojects (may or may not survive
    # occlusion; it must at least not crash and the memory persists)
    r2 = session.step(ds.poses[1], session.intrinsics_for(ds.poses[1]))
    assert len(session.points_3d) == 1
    session.points_3d.clear()


def test_project_roundtrip():
    ds = SyntheticSphereDataset(H=32, W=32, n_views=2)
    pose = ds.poses[0]
    intr = ds.intrinsics
    pts = np.array([[0.0, 0.0, 0.0], [0.2, 0.1, -0.1]], np.float32)
    xy, z, on = project_to_2d(pts, pose, intr, 32, 32)
    assert on.all() and (z > 0).all()
    back = project_to_3d(xy, z, pose, intr)
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_generate_masks_writes_labels(tmp_path):
    ds = SyntheticSphereDataset(H=48, W=48, n_views=3)
    cfg = Config()
    sam = _tiny_sam()
    pts = np.array([[0.0, 0.0, 0.0]], np.float32)  # sphere center
    out_dir = str(tmp_path / "labels")
    valid = generate_masks(cfg, ds, pts, sam, out_dir)
    assert len(valid) == 3
    files = os.listdir(out_dir)
    assert "valid.json" in files
    assert sum(f.endswith("_masks.npy") for f in files) == 3
    m = np.load(os.path.join(out_dir, "0000_masks.npy"))
    assert m.shape == (48, 48)
    assert set(np.unique(m)) <= {-1, 0, 1}


def test_evaluation_harness(tmp_path):
    gt_dir, res_dir = str(tmp_path / "gt"), str(tmp_path / "res")
    os.makedirs(gt_dir)
    os.makedirs(res_dir)
    gt = np.zeros((16, 16), np.int64)
    gt[4:12, 4:12] = 1
    pred = np.zeros((16, 16), np.int64)
    pred[5:12, 4:12] = 1
    np.save(os.path.join(gt_dir, "v1_masks.npy"), gt)
    np.save(os.path.join(res_dir, "v1_mask.npy"), pred)
    res = evaluation.evaluate_scene(gt_dir, res_dir, ["v1"], "ours")
    assert res["n_views"] == 1
    assert 0.8 < res["miou"] < 1.0
    assert res["acc"] > 0.9
    assert evaluation.eval_iou(gt, gt) == 1.0


def test_rle_roundtrip(rng):
    m = rng.random((13, 17)) > 0.5
    rle = mask_to_rle(m)
    np.testing.assert_array_equal(rle_to_mask(rle), m)


def test_box_nms():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], float)
    keep = box_nms(boxes, np.array([0.9, 0.8, 0.7]), iou_thresh=0.5)
    assert keep == [0, 2]  # near-duplicate suppressed


def test_point_grid():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert g.min() > 0 and g.max() < 1


def test_auto_generator_runs(session):
    gen = AutomaticMaskGenerator(
        session.sam, points_per_side=4, pred_iou_thresh=-10.0,
        stability_score_thresh=0.0,
    )
    img = (np.random.default_rng(0).random((48, 48, 3)) * 255).astype(np.uint8)
    out = gen.generate(image=img)
    assert isinstance(out, list)
    if out:  # random weights may produce empty masks; check format when present
        assert "segmentation" in out[0] and "predicted_iou" in out[0]


def test_auto_generator_batched_matches_loop(session):
    """Batched decode == one-at-a-time decode: same logits, same mask set."""
    feats = np.random.default_rng(1).normal(
        0, 1, (8, 8, 32)).astype(np.float32)
    session.sam.set_features(feats, 64, 64)
    pts = build_point_grid(3) * 64.0
    logits_b, iou_b = session.sam.predict_batch(pts[:, None, :], chunk=4)
    for k in range(len(pts)):
        masks, iou, _ = session.sam.predict(
            pts[k : k + 1], np.ones(1, np.int32), multimask_output=True,
            return_logits=True)
        np.testing.assert_allclose(logits_b[k], masks, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(iou_b[k], iou, rtol=1e-4, atol=1e-4)


def test_auto_generator_crop_pyramid(session):
    """crop_n_layers > 0 runs the grid over overlapping crops and returns
    full-image masks (reference auto_generator.py:42-47, 165-188)."""
    from sanerf_tpu.apps.auto_generator import generate_crop_boxes

    boxes, layers = generate_crop_boxes((64, 64), 1, 512 / 1500)
    assert boxes[0] == [0, 0, 64, 64] and layers[0] == 0
    assert len(boxes) == 5 and set(layers) == {0, 1}  # 1 full + 2x2 crops
    for x0, y0, x1, y1 in boxes[1:]:
        assert 0 <= x0 < x1 <= 64 and 0 <= y0 < y1 <= 64

    gen = AutomaticMaskGenerator(
        session.sam, points_per_side=2, pred_iou_thresh=-10.0,
        stability_score_thresh=0.0, crop_n_layers=1,
        crop_n_points_downscale_factor=2,
    )
    feats = np.random.default_rng(2).normal(
        0, 1, (8, 8, 32)).astype(np.float32)
    out = gen.generate(features=feats, hw=(64, 64))
    assert isinstance(out, list)
    for rec in out:
        assert rec["segmentation"]["size"] == [64, 64]  # full-image frame
        assert "crop_box" in rec


def test_cli_end_to_end(tmp_path):
    """`python -m sanerf_tpu.apps.main` on a transforms.json fixture: train a
    few steps, checkpoint, then --test renders frames."""
    import cv2

    from sanerf_tpu.apps.main import main as cli_main
    from sanerf_tpu.data.synthetic import SyntheticSphereDataset
    from sanerf_tpu.utils import camera as cam_util

    root = str(tmp_path / "scene")
    os.makedirs(root, exist_ok=True)
    ds = SyntheticSphereDataset(H=32, W=32, n_views=8)
    frames = []
    for i in range(8):
        cv2.imwrite(os.path.join(root, f"r_{i}.png"),
                    cv2.cvtColor((ds.images[i] * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        frames.append({"file_path": f"r_{i}",
                       "transform_matrix": ds.poses[i].tolist()})
    fovy_rad = 2 * np.arctan(0.5 * 32 / ds.intrinsics[0])
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"camera_angle_x": float(fovy_rad), "frames": frames}, f)

    ws = str(tmp_path / "ws")
    common = [root, "--workspace", ws, "--data_type", "llff",
              "--num_steps", "12", "6", "--num_rays", "256",
              "--no-adaptive_num_rays",
              "--max_ray_batch", "4096", "--bound", "4"]
    trainer = cli_main(common + ["--iters", "30", "--eval_cnt", "1"])
    assert trainer.global_step >= 30
    assert os.path.isdir(os.path.join(ws, "checkpoints"))

    trainer = cli_main(common + ["--test", "--test_split", "val"])
    results = os.listdir(os.path.join(ws, "results"))
    assert any(f.endswith("_rgb.png") for f in results)
    assert "pose_dir.json" in results


def test_headless_viewer_loop(session):
    from sanerf_tpu.apps.gui import HeadlessViewer

    cfg = Config(render=RC, model=MC)
    viewer = HeadlessViewer(cfg, session)
    session.points_3d.clear()
    viewer.orbit(50, 10)
    res = viewer.frame()
    assert res.rgb.shape == (64, 64, 3)
    assert viewer.fps > 0
    res = viewer.right_click(32, 32)
    assert len(session.points_3d) == 1
    session.points_3d.clear()
    # adaptive downscale controller reacts to slow frames
    viewer.ctrl.update_downscale(3000.0)
    assert viewer.ctrl.downscale > 1


def test_render_mask_visualizations(rng):
    from sanerf_tpu.train.trainer import render_mask_visualization

    rgb = rng.random((8, 8, 3)).astype(np.float32)
    logits = rng.standard_normal((8, 8, 3)).astype(np.float32)
    for mode in ("mask", "composition", "heatmap"):
        out = render_mask_visualization(rgb, logits, mode, instance_id=1)
        assert out.shape == (8, 8, 3)
        assert np.isfinite(out).all()
    m = render_mask_visualization(rgb, logits, "mask", instance_id=0)
    assert set(np.unique(m)) <= {0.0, 1.0}


def test_encoder_factory(rng):
    import jax
    import jax.numpy as jnp
    from sanerf_tpu.ops.encoding import get_encoder

    x = jnp.asarray(rng.uniform(-1, 1, (16, 3)).astype(np.float32))
    for name, kw in [("frequency", dict(multires=4)), ("sh", dict(degree=4)),
                     ("hashgrid", dict(num_levels=2, log2_hashmap_size=8,
                                       desired_resolution=16)),
                     ("tiledgrid", dict(num_levels=2, log2_hashmap_size=8,
                                        desired_resolution=16)),
                     ("None", {})]:
        params, apply, dim = get_encoder(name, **kw)
        d = np.asarray(x / jnp.linalg.norm(x, axis=-1, keepdims=True))
        inp = jnp.asarray(d) if name == "sh" else x
        out = apply(params, inp, bound=1.0)
        assert out.shape == (16, dim), name


def test_frame_pipeline_double_buffered(rng):
    """FramePipeline: one-program frame (rays from pose + RGB + feature +
    3D-point reprojection/occlusion + decode + overlay + spp), pipelined
    across calls (frame N returns on dispatch N+1)."""
    from sanerf_tpu.apps.frame_pipeline import FramePipeline
    from sanerf_tpu.config import ModelConfig, RenderConfig
    from sanerf_tpu.models import fields
    from sanerf_tpu.models.sam import predictor as sam_predictor_mod

    from tests.test_sam import TINY_SAM

    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    mc = ModelConfig(field_type="mlp", with_sam=True,
                     sam_use_view_direction=True, sam_feat_dim=32,
                     mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                     mlp_prop_enc_freqs=3, mlp_prop_width=16, mlp_prop_depth=2,
                     prop_resolutions=(32,))
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(0))
    sam_params = sam_predictor_mod.init_params(TINY_SAM, jax.random.key(1))

    H = W = 16
    h = w = 8
    f = 0.5 * H
    intr = np.asarray([f, f, W / 2, H / 2], np.float32)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, 2.0], [0, 0, 0, 1]], np.float32)

    pipe = FramePipeline(model, params, TINY_SAM, sam_params, H, W, h, w)
    p3, act = pipe.pad_points([[0.0, 0.0, 0.0]])  # point ahead of the camera
    img1, depth1, mask1, pts2d, valid = pipe.render(pose, intr, p3, act)
    assert img1.shape == (H, W, 3) and img1.dtype == np.uint8
    # depth/mask/points are device arrays (lazy fetch); np.asarray on demand
    depth1 = np.asarray(depth1)
    mask1 = np.asarray(mask1)
    assert depth1.shape == (H, W)
    assert mask1.shape == (H, W) and mask1.dtype == bool
    # the point projects to the image center (occlusion may gate validity
    # on a random-init field, but the geometry is exact)
    pts2d = np.asarray(pts2d)
    assert abs(pts2d[0, 0] - (W / 2 - 0.5)) < 1e-3
    assert abs(pts2d[0, 1] - (H / 2 - 0.5)) < 1e-3
    # second call returns the PREVIOUS dispatch's frame; flush drains it
    img2, *_ = pipe.render(pose, intr, *pipe.pad_points(None))
    assert img2.shape == (H, W, 3)
    out = pipe.flush()
    assert out is not None
    # no active points -> mask gated off everywhere
    assert not np.asarray(out[2]).any()
    # sync render has no pipeline latency
    img3, *_ = pipe.render_sync(pose, intr, *pipe.pad_points(None))
    assert np.isfinite(depth1).all()
    assert pipe.dispatch_count == 3  # 2 pipelined renders + 1 sync


def test_frame_pipeline_spp_accumulates_on_device(rng):
    """The spp acc buffer lives on device: frame(spp=1, key) returns the
    running MEAN of two frames, and spp=0 restarts."""
    from sanerf_tpu.apps.frame_pipeline import FramePipeline
    from sanerf_tpu.config import ModelConfig, RenderConfig
    from sanerf_tpu.models import fields

    rc = RenderConfig(num_steps=(8, 4), bound=4.0, contract=True)
    mc = ModelConfig(field_type="mlp",
                     mlp_enc_freqs=4, mlp_field_width=32, mlp_field_depth=4,
                     mlp_prop_enc_freqs=3, mlp_prop_width=16, mlp_prop_depth=2,
                     prop_resolutions=(32,))
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(0))

    H = W = 16
    f = 0.5 * H
    intr = np.asarray([f, f, W / 2, H / 2], np.float32)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, 2.0], [0, 0, 0, 1]], np.float32)
    pipe = FramePipeline(model, params, None, None, H, W, overlay=False)
    p3, act = pipe.pad_points(None)

    base, depth0, *_ = pipe.render_sync(pose, intr, p3, act, spp=0)
    pert, depth1, *_ = pipe.render_sync(pose, intr, p3, act, spp=1,
                                        key=jax.random.key(5), perturb=True)
    # the perturbed sample really is a different stratified render (f32
    # depth avoids u8 quantization hiding small diffs)
    assert float(np.abs(np.asarray(depth1) - np.asarray(depth0)).max()) > 0
    restart, *_ = pipe.render_sync(pose, intr, p3, act, spp=0)
    np.testing.assert_array_equal(restart, base)


def test_session_one_dispatch_per_frame(session):
    """The session and GUI run the fused FramePipeline: exactly ONE device
    dispatch per interactive frame, clicks included (VERDICT r2 item 2)."""
    ds = SyntheticSphereDataset(H=64, W=64, n_views=2)
    session.points_3d.clear()
    pose = ds.poses[0]
    intr = session.intrinsics_for(pose)
    session.step(pose, intr)  # warm (ensures a depth frame exists)
    n0 = session.dispatch_count
    session.step(pose, intr)
    assert session.dispatch_count == n0 + 1
    n0 = session.dispatch_count
    session.step(pose, intr, click=(32, 32))  # click: still one dispatch
    assert session.dispatch_count == n0 + 1
    session.points_3d.clear()


def test_headless_viewer_controls(session):
    """GUI control surface (VERDICT r1 item 6): live AABB, bg color,
    image/depth mode, spp accumulation, pan, train start/stop plumbing."""
    from sanerf_tpu.apps.gui import HeadlessViewer
    from sanerf_tpu.config import Config

    cfg = Config()
    v = HeadlessViewer(cfg, session)
    v.max_spp = 4

    r1 = v.frame()
    assert v.spp == 1
    r2 = v.frame()  # static camera -> accumulate
    assert v.spp == 2
    assert np.isfinite(r2.composed).all()

    v.pan(3, 0)  # camera moved -> accumulation restarts
    r3 = v.frame()
    assert v.spp == 1
    r3 = v.frame()  # pump: double-buffered frames lag state by one

    # shrinking the live AABB to a sliver changes the render
    v.aabb = np.asarray([-0.05, -0.05, -0.05, 0.05, 0.05, 0.05], np.float32)
    v.mark_dirty()
    v.frame()  # dispatches the new-AABB frame (returns the previous one)
    r4 = v.frame()
    assert not np.allclose(r4.composed, r3.composed)

    # depth display mode is grayscale
    v.mode = "depth"
    v.mark_dirty()
    v.frame()
    rd = v.frame()
    np.testing.assert_allclose(rd.composed[..., 0], rd.composed[..., 1],
                               atol=0.3)  # overlay points may differ

    # train controls are safe no-ops without a trainer
    v.start_training()
    assert not v.training
    v.stop_training()
    v.save_checkpoint()


def test_interactive_session_bench_hierarchy():
    """Smoke the bench.py primary (32, 24) inference hierarchy through the
    product loop (tiny model/frame): pipelined + sync frames both finite."""
    rc = dataclasses.replace(RC, num_steps=(32, 24))
    model = fields.make_model(MC, rc)
    params = fields.init_params(model, jax.random.key(0))
    s = InteractiveSession(Config(render=rc, model=MC), model, params,
                           _tiny_sam(), H=32, W=32)
    ds = SyntheticSphereDataset(H=32, W=32, n_views=2)
    pose = ds.poses[0]
    intr = s.intrinsics_for(pose)
    r_pipe = s.step(pose, intr, pipelined=True)
    r_sync = s.step(pose, intr, pipelined=False)
    assert np.isfinite(np.asarray(r_sync.rgb)).all()
    assert r_pipe.rgb.shape == (32, 32, 3)


def test_yuv420_display_transport(rng):
    """The yuv420 fetch format (half the display bytes through the relay)
    round-trips to within normal chroma-subsampling error of the exact
    rgb8 frame, grayscale exactly, through the same FramePipeline API."""
    from sanerf_tpu.apps.frame_pipeline import (
        FramePipeline, _rgb_to_yuv420, yuv420_to_rgb8)

    # pure math round trip: gray images survive exactly (Cb = Cr = 128)
    g = np.linspace(0, 1, 16 * 16, dtype=np.float32).reshape(16, 16)
    y, cbcr = jax.device_get(_rgb_to_yuv420(np.repeat(g[..., None], 3, -1)))
    assert np.all(cbcr == 128)
    rt = yuv420_to_rgb8(y, cbcr)
    np.testing.assert_allclose(rt[..., 0], np.round(g * 255), atol=1)

    # natural-image round trip: smooth random field, PSNR > 30 dB
    x = rng.random((8, 8, 3)).astype(np.float32)
    img = np.kron(x, np.ones((4, 4, 1), np.float32))  # 32x32, 4x4 blocks
    y, cbcr = jax.device_get(_rgb_to_yuv420(img))
    rt = yuv420_to_rgb8(y, cbcr).astype(np.float32) / 255.0
    mse = float(np.mean((rt - np.clip(img, 0, 1)) ** 2))
    assert 10 * np.log10(1.0 / max(mse, 1e-12)) > 30.0

    # pipeline integration: same scene via rgb8 and yuv420 transports
    model = fields.make_model(MC, RC)
    params = fields.init_params(model, jax.random.key(0))
    H = W = 16
    f = 0.5 * H
    intr = np.asarray([f, f, W / 2, H / 2], np.float32)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, 2.0], [0, 0, 0, 1]], np.float32)
    exact = FramePipeline(model, params, None, None, H, W,
                          fetch_format="rgb8")
    sub = FramePipeline(model, params, None, None, H, W,
                        fetch_format="yuv420")
    assert sub.fetch_format == "yuv420"
    p3, act = exact.pad_points([np.asarray([0.0, 0.0, 0.4], np.float32)])
    a, _, _, pa, va = exact.render_sync(pose, intr, p3, act)
    b, _, _, pb, vb = sub.render_sync(pose, intr, p3, act)
    assert b.shape == (H, W, 3) and b.dtype == np.uint8
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 4.0
    # the packed buffer's metadata rows round-trip pts2d/valid exactly
    # (f32 bitcast + u8 flags) — one fetched array carries the whole frame
    assert isinstance(pb, np.ndarray) and isinstance(vb, np.ndarray)
    np.testing.assert_array_equal(np.asarray(va), vb)
    np.testing.assert_allclose(np.asarray(pa), pb, rtol=0, atol=0)
    # odd frame sizes fall back to exact rgb8 (4:2:0 needs even dims)
    odd = FramePipeline(model, params, None, None, 15, 15,
                        fetch_format="yuv420")
    assert odd.fetch_format == "rgb8"
