"""Open-vocabulary 3D segmentation — the reference's announced X-Decoder demo.

The reference readme announces an X-Decoder open-vocabulary demo
(/root/reference/readme.md:21) but ships no X-Decoder code in the snapshot
(SURVEY.md §2.2; BASELINE.json lists it under `configs`). This module
provides the CAPABILITY — "type a phrase, get a 3D-consistent mask" —
TPU-natively, by reusing the framework's existing machinery instead of
porting a second vision-language model:

1. `LangDistillTrainer` distills a pixel-aligned LANGUAGE-embedding field
   into the NeRF. It IS the stage-2 distillation loop
   (train/distill.py:SamDistillTrainer — teacher ring-buffer cache, frozen
   RGB/geometry backbone, low-res student render, MSE): the teacher is any
   callable mapping a rendered uint8 frame to a [h, w, D] map of
   language-aligned image embeddings (X-Decoder pixel decoder, CLIP patch
   embeddings, LSeg, ...), and the field head is the existing samvit head
   at `ModelConfig.sam_feat_dim = D`. Teacher outputs are L2-normalized so
   cosine relevancy is meaningful at query time.
2. `relevancy()` scores a rendered embedding map against a text embedding
   with the pairwise-softmax relevancy of LERF (Kerr et al. 2023, eq. 2):
   rel = min_i softmax(phi·t / (phi·t + phi·neg_i)) over canonical
   negatives — robust to the global similarity offset CLIP spaces have.
3. `text_query_mask()` renders nothing itself: given the embedding map a
   `FramePipeline`/`render_staged` call produced, it returns the
   thresholded relevancy mask, optionally REFINED through the SAM prompt
   decoder by prompting with the relevancy peak (the same
   rendered-feature decode path the interactive GUI runs — utils.py:
   1409-1475) when a SAM-distilled feature map is available.
4. `TextEncoder` is pluggable because this environment has zero egress
   and no CLIP weights: `PrecomputedTextEncoder` serves embeddings from an
   .npz vocabulary; `HFClipTextEncoder` wraps a local HuggingFace CLIP
   checkpoint directory when one exists (transformers is in-image).

End-to-end recipe (mirrors scripts/train_sam.sh with a language teacher):

    trainer = LangDistillTrainer("lang", cfg, model,
                                 teacher=my_clip_image_embedder)
    trainer.train(dataset, max_epoch=..., steps_per_epoch=...)
    # interactive / offline query:
    feats = render_staged(model, params, rays_o, rays_d,
                          return_feats=True)["samvit"]  # [H*W, D]
    mask = text_query_mask(feats.reshape(H, W, -1),
                           text_enc.encode(["a wooden chair"])[0],
                           negatives=text_enc.encode(CANONICAL_NEGATIVES))
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.train.distill import SamDistillTrainer

# LERF's canonical negative phrases: generic distractors every query is
# scored against so "relevant" means "more similar than anything generic"
CANONICAL_NEGATIVES = ("object", "things", "stuff", "texture")


# ---------------------------------------------------------------------------
# text encoders
# ---------------------------------------------------------------------------


class PrecomputedTextEncoder:
    """Text embeddings from an .npz vocabulary ({phrase: [D] array}).

    The zero-egress answer: compute embeddings offline with any
    language-image model (CLIP, X-Decoder's text encoder) and ship the
    table. Lookup is exact-match on the normalized phrase.
    """

    def __init__(self, path: str):
        self.table = {k: np.asarray(v, np.float32)
                      for k, v in np.load(path).items()}

    def encode(self, phrases: Sequence[str]) -> np.ndarray:
        out = []
        for p in phrases:
            key = p.strip().lower()
            if key not in self.table:
                raise KeyError(
                    f"phrase {p!r} not in the precomputed vocabulary "
                    f"({len(self.table)} entries)")
            v = self.table[key]
            out.append(v / max(np.linalg.norm(v), 1e-8))
        return np.stack(out)


class HFClipTextEncoder:
    """CLIP text tower from a LOCAL HuggingFace checkpoint directory
    (e.g. a clip-vit-base-patch16 snapshot). transformers is in-image;
    weights must already be on disk — pass the directory or set
    SANERF_CLIP_DIR."""

    def __init__(self, model_dir: Optional[str] = None):
        model_dir = model_dir or os.environ.get("SANERF_CLIP_DIR")
        if not model_dir or not os.path.isdir(model_dir):
            raise FileNotFoundError(
                "no local CLIP checkpoint (set SANERF_CLIP_DIR)")
        from transformers import CLIPTextModelWithProjection, CLIPTokenizer

        self.tok = CLIPTokenizer.from_pretrained(model_dir)
        self.model = CLIPTextModelWithProjection.from_pretrained(model_dir)

    def encode(self, phrases: Sequence[str]) -> np.ndarray:
        import torch

        with torch.no_grad():
            toks = self.tok(list(phrases), padding=True, return_tensors="pt")
            emb = self.model(**toks).text_embeds
            emb = emb / emb.norm(dim=-1, keepdim=True)
        return emb.cpu().numpy().astype(np.float32)


# ---------------------------------------------------------------------------
# relevancy + query
# ---------------------------------------------------------------------------


def relevancy(feats: jax.Array, text: jax.Array,
              negatives: jax.Array, temperature: float = 0.1) -> jax.Array:
    """LERF pairwise-softmax relevancy.

    feats [..., D] (any leading shape), text [D], negatives [K, D] — all
    cosine-comparable (feats are normalized here; encoders normalize text).
    Returns [...] scores in (0, 1): >0.5 means closer to the query than to
    EVERY canonical negative.
    """
    f = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)
    pos = f @ text  # [...]
    neg = f @ negatives.T  # [..., K]
    pair = jnp.exp(pos[..., None] / temperature) / (
        jnp.exp(pos[..., None] / temperature)
        + jnp.exp(neg / temperature))
    return jnp.min(pair, axis=-1)


def text_query_mask(
    feat_map: jax.Array,  # [H, W, D] rendered language-embedding map
    text: jax.Array,  # [D]
    negatives: jax.Array,  # [K, D]
    threshold: float = 0.5,
    sam_predictor=None,
    samvit_map: Optional[jax.Array] = None,  # [h, w, 256] SAM-feature map
    frame_hw: Optional[tuple] = None,
):
    """Text -> (mask [H, W] bool, relevancy [H, W] float, peak (x, y)).

    The plain path thresholds the relevancy map. When `sam_predictor` and a
    SAM-distilled feature map are given, the relevancy PEAK becomes a point
    prompt through the rendered-feature decode path (predictor.set_features
    + predict — the GUI's click path), which snaps the open-vocab region to
    a sharp instance mask; the returned mask is then SAM's.
    """
    rel = relevancy(feat_map, text, negatives)
    rel_np = np.asarray(rel, np.float32)
    peak_flat = int(np.argmax(rel_np))
    py, px = np.unravel_index(peak_flat, rel_np.shape)
    mask = rel_np > threshold
    if sam_predictor is not None and samvit_map is not None:
        H, W = frame_hw or rel_np.shape
        sx = W / rel_np.shape[1]
        sy = H / rel_np.shape[0]
        sam_predictor.set_features(samvit_map, H, W)
        sam_mask, _, _ = sam_predictor.predict(
            np.array([[px * sx, py * sy]], np.float32),
            np.array([1], np.int32))
        mask = np.asarray(sam_mask[0] if sam_mask.ndim == 3 else sam_mask)
    return mask, rel_np, (float(px), float(py))


# ---------------------------------------------------------------------------
# distillation
# ---------------------------------------------------------------------------


class LangDistillTrainer(SamDistillTrainer):
    """Stage-2 distillation with a language-embedding teacher.

    Identical choreography to the SAM branch (frozen backbone, teacher
    ring-buffer cache, low-res student render, MSE vs the resized teacher
    map) — the teacher callable returns [h, w, D] language-aligned
    embeddings instead of ViT-H features, and targets are L2-normalized so
    the distilled field lives on the unit sphere cosine relevancy assumes.
    Build the model with ModelConfig(with_sam=True, sam_feat_dim=D).
    """

    def teacher_features(self, image_uint8: np.ndarray) -> jax.Array:
        feats = super().teacher_features(image_uint8)
        return feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)


def main(argv=None):
    """Offline open-vocab demo: render test views from a lang-distilled
    workspace, score a text phrase, write relevancy + mask overlays.

        python -m sanerf_tpu.apps.open_vocab <data> --workspace trial_lang \
            --vocab vocab.npz --phrase "a wooden chair" [--threshold 0.5]
    """
    from sanerf_tpu.apps.main import build_parser, config_from_args
    from sanerf_tpu.data.provider import SceneDataset
    from sanerf_tpu.models import fields
    from sanerf_tpu.models.renderer import run_rays
    from sanerf_tpu.train.trainer import Trainer

    p = build_parser()
    p.add_argument("--vocab", required=True,
                   help=".npz phrase->embedding table (or set "
                        "SANERF_CLIP_DIR for a local HF CLIP)")
    p.add_argument("--phrase", required=True)
    p.add_argument("--negatives", nargs="*",
                   default=list(CANONICAL_NEGATIVES))
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--out_dir", default=None)
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    try:
        enc = HFClipTextEncoder()
    except FileNotFoundError:
        enc = PrecomputedTextEncoder(args.vocab)
    text = jnp.asarray(enc.encode([args.phrase])[0])
    negs = jnp.asarray(enc.encode(args.negatives))

    model = fields.make_model(cfg.model, cfg.render)
    trainer = Trainer("ngp", cfg, model, workspace=cfg.workspace,
                      use_checkpoint=cfg.ckpt)
    ds = SceneDataset(cfg, "test")
    out_dir = args.out_dir or os.path.join(cfg.workspace, "open_vocab")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for idx in range(len(ds)):
        batch = ds.collate_sam(rng, index=idx)
        out = run_rays(model, trainer.eval_params(),
                       jnp.asarray(batch["rays_o_lr"]),
                       jnp.asarray(batch["rays_d_lr"]), return_feats=True)
        fmap = out["samvit"].reshape(batch["h"], batch["w"], -1)
        mask, rel, peak = text_query_mask(fmap, text, negs,
                                          threshold=args.threshold)
        np.save(os.path.join(out_dir, f"{idx:04d}_relevancy.npy"), rel)
        np.save(os.path.join(out_dir, f"{idx:04d}_mask.npy"), mask)
    print(f"wrote {len(ds)} relevancy/mask pairs to {out_dir} "
          f"(phrase: {args.phrase!r})")


def make_region_teacher(
    regions: Callable[[np.ndarray], np.ndarray],
    vocabulary: np.ndarray,  # [R, D] one embedding per region id
    grid: int = 64,
):
    """Synthetic teacher for tests/demos: `regions(img_uint8) -> [h, w]
    int region ids`; each pixel gets its region's vocabulary embedding.
    Stand-in for an X-Decoder/CLIP image tower in the zero-egress env."""

    def teacher(image_uint8: np.ndarray) -> np.ndarray:
        import cv2

        small = cv2.resize(image_uint8, (grid, grid),
                           interpolation=cv2.INTER_NEAREST)
        ids = regions(small)
        return vocabulary[ids]

    return teacher


if __name__ == "__main__":
    main()
