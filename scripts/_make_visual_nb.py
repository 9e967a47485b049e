"""One-shot generator for notebooks/visual.ipynb (run once, committed output).

The reference ships `visual.ipynb` — a debugging scratchpad for workspace
artifacts (mask .npy overlays, error maps, sam_project reprojection checks).
This builds our equivalent over the sanerf_tpu artifact surface.
"""

import nbformat as nbf

nb = nbf.v4.new_notebook()
md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell

cells = []

cells.append(md("""\
# visual — workspace artifact scratchpad

Debugging companion to the trainers (the reference's `visual.ipynb` role):
load a workspace's `validation/` dumps (pred / gt / error / depth /
feature / mask arrays), visualize them, plot the metrics JSONL, and sanity
check the 2D↔3D reprojection used by SAM label projection.

Every cell degrades gracefully when the workspace doesn't exist (fresh
clone): the last section renders a frame from a random-init model on CPU so
the notebook always produces pixels.

Set `WORKSPACE` below (or the `SANERF_WORKSPACE` env var) to your trial dir.
"""))

cells.append(code("""\
import glob
import json
import os

import numpy as np
import matplotlib.pyplot as plt

WORKSPACE = os.environ.get("SANERF_WORKSPACE", "trial_garden")
VAL = os.path.join(WORKSPACE, "validation")
print("workspace:", WORKSPACE, "| exists:", os.path.isdir(VAL))


def latest(pattern):
    fs = sorted(glob.glob(os.path.join(VAL, pattern)))
    return fs[-1] if fs else None
"""))

cells.append(md("## Pred / GT / error triplets (latest eval epoch)"))

cells.append(code("""\
import imageio.v2 as imageio

preds = sorted(glob.glob(os.path.join(VAL, "ep*_???.png")))
if preds:
    ep = os.path.basename(preds[-1]).split("_")[0]  # latest epoch prefix
    views = sorted(glob.glob(os.path.join(VAL, f"{ep}_???.png")))[:4]
    fig, axes = plt.subplots(len(views), 3, figsize=(9, 3 * len(views)),
                             squeeze=False)
    for r, p in enumerate(views):
        stem = p[:-4]
        for c, (suffix, title) in enumerate(
                [("", "pred"), ("_gt", "gt"), ("_error", "|err|")]):
            f = stem + suffix + ".png"
            if os.path.exists(f):
                axes[r][c].imshow(imageio.imread(f))
            axes[r][c].set_title(f"{os.path.basename(stem)} {title}")
            axes[r][c].axis("off")
    plt.tight_layout()
else:
    print("no validation dumps yet — run an eval first")
"""))

cells.append(md("## Depth and SAM-feature dumps\\n"
                "Feature arrays are 256-d; PCA the channels to RGB."))

cells.append(code("""\
dfile = latest("ep*_depth.npy")
ffile = latest("ep*_feature.npy")
fig, ax = plt.subplots(1, 2, figsize=(9, 4))
if dfile:
    d = np.load(dfile)
    im = ax[0].imshow(d, cmap="turbo")
    plt.colorbar(im, ax=ax[0], fraction=0.046)
    ax[0].set_title(os.path.basename(dfile))
ax[0].axis("off")
if ffile:
    feat = np.load(ffile)          # [H*W, C] or [H, W, C]
    if feat.ndim == 2:
        side = int(np.sqrt(feat.shape[0]))
        feat = feat.reshape(side, side, -1)
    flat = feat.reshape(-1, feat.shape[-1]).astype(np.float32)
    flat = flat - flat.mean(0)
    _, _, vt = np.linalg.svd(flat[:: max(1, len(flat) // 4096)],
                             full_matrices=False)
    rgb = flat @ vt[:3].T
    rgb = (rgb - rgb.min(0)) / np.maximum(rgb.ptp(0), 1e-6)
    ax[1].imshow(rgb.reshape(*feat.shape[:2], 3))
    ax[1].set_title("feature PCA → RGB")
ax[1].axis("off")
plt.tight_layout()
"""))

cells.append(md("## Instance-mask logits (`*_mask.npy`)\\n"
                "Saved by the mask trainer's eval: `[H*W, n_inst(+1)]` "
                "logits. Argmax → instance id map, overlaid on the render."))

cells.append(code("""\
mfile = latest("*_mask.npy")
if mfile:
    logits = np.load(mfile)
    side = int(np.sqrt(logits.shape[0])) if logits.ndim == 2 else None
    ids = (logits.reshape(side, side, -1) if side else logits).argmax(-1)
    fig, ax = plt.subplots(1, 2, figsize=(9, 4))
    ax[0].imshow(ids, cmap="tab20"); ax[0].set_title("argmax instance id")
    base = mfile.replace("_mask.npy", ".png")
    if os.path.exists(base):
        img = imageio.imread(base).astype(np.float32) / 255
        over = img.copy()
        for k in range(ids.max() + 1):
            m = ids == k
            if 0 < m.sum() < m.size:  # skip background-everything ids
                over[m] = 0.5 * over[m] + 0.5 * np.array(
                    plt.get_cmap("tab10")(k % 10)[:3])
        ax[1].imshow(over); ax[1].set_title("overlay")
    for a in ax: a.axis("off")
else:
    print("no mask dumps (train a mask head first: scripts/train_mask.sh)")
"""))

cells.append(md("## Metrics curves (`metrics_<name>.jsonl`)"))

cells.append(code("""\
mfiles = glob.glob(os.path.join(WORKSPACE, "metrics_*.jsonl"))
for mf in mfiles:
    rows = [json.loads(l) for l in open(mf) if l.strip()]
    tr = [(r["step"], r["psnr"]) for r in rows if r.get("kind") == "train"
          and "psnr" in r]
    if tr:
        s, p = zip(*tr)
        plt.plot(s, p, label=os.path.basename(mf))
if mfiles:
    plt.xlabel("step"); plt.ylabel("train PSNR (dB)"); plt.legend()
else:
    print("no metrics files in", WORKSPACE)
"""))

cells.append(md("""\
## 2D ↔ 3D reprojection round trip

`apps/sam_project.py` projects SAM prompts between views (the reference's
`sam_project.py:406-455`). The invariant worth checking when masks land in
the wrong place: `project_to_2d(project_to_3d(px, depth)) == px` for the
SAME pose, and consistent epipolar placement for a second pose.
"""))

cells.append(code("""\
from sanerf_tpu.apps.sam_project import project_to_2d, project_to_3d

rng = np.random.default_rng(0)
H = W = 128
intr = np.array([110.0, 110.0, W / 2, H / 2])
# a camera on the +z axis looking at the origin (OpenGL convention)
pose = np.eye(4); pose[2, 3] = 3.0
px = rng.uniform(8, 120, (64, 2))
depth = rng.uniform(2.0, 4.0, 64)
pts = project_to_3d(px, depth, pose, intr)
xy, z, on = project_to_2d(pts, pose, intr, H, W)
err = np.abs(xy - px).max()
print(f"round-trip max pixel error: {err:.2e}  (on-screen: {on.sum()}/64)")
assert err < 1e-9
"""))

cells.append(md("""\
## No-workspace fallback: render a random-init field on CPU

Always-runnable smoke: a 64² frame through `render_staged` on the CPU
backend (tiny shapes; no checkpoint needed). Useful as a template for
loading a real checkpoint — swap `init_params` for
`sanerf_tpu.train.checkpoints.load_checkpoint`.
"""))

cells.append(code("""\
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax, jax.numpy as jnp
from sanerf_tpu.config import ModelConfig, RenderConfig
from sanerf_tpu.models import fields
from sanerf_tpu.models.renderer import render_staged

rc = RenderConfig(num_steps=(32, 16, 8), bound=4.0, contract=True)
mc = ModelConfig(field_type="mlp")
model = fields.make_model(mc, rc)
params = fields.init_params(model, jax.random.key(0))
H = W = 64; f = 60.0
i, j = np.meshgrid(np.arange(W) + .5, np.arange(H) + .5, indexing="xy")
d = np.stack([(i - W/2)/f, -(j - H/2)/f, -np.ones_like(i)], -1).reshape(-1, 3)
o = np.zeros_like(d); o[:, 2] = 3.0
out = render_staged(model, params, jnp.asarray(o, jnp.float32),
                    jnp.asarray(d, jnp.float32))
fig, ax = plt.subplots(1, 2, figsize=(8, 4))
ax[0].imshow(np.asarray(out["image"]).reshape(H, W, 3)); ax[0].set_title("rgb")
ax[1].imshow(np.asarray(out["depth"]).reshape(H, W), cmap="turbo")
ax[1].set_title("depth")
for a in ax: a.axis("off")
"""))

nb["cells"] = cells
nb["metadata"]["kernelspec"] = {
    "display_name": "Python 3", "language": "python", "name": "python3"}
with open("notebooks/visual.ipynb", "w") as f:
    nbf.write(nb, f)
print("wrote notebooks/visual.ipynb")
