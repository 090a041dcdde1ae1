"""The full evaluation protocol as library functions: a results folder of
generated images → detections → object recall / relation accuracy / CLIP
fidelity → one JSON-able dict.

The reference's visible evaluation output is the pair of printed numbers at
`evaluation/detector_result_gpt.py:164-166` (object recall) and
`evaluation/relation_result_gpt.py` (relation accuracy), computed from an
external detrex DINO-Swin-L detector.  Here the same protocol math
(`eval/metrics.py`) runs over a pluggable detector:

- ``detections.json`` produced anywhere (the faithful route — detrex on a
  GPU box, `scripts/export_detections.py`), or
- the self-contained CLIP grid detector (`eval/clip_detector.py`), a
  calibrated approximation (mechanism ceiling recall@IoU0.5 = 0.95 with an
  oracle classifier, floor = 0.0 with random embeddings —
  `scripts/calibrate_clip_detector.py`, docs/EVALUATION.md).  Any number it
  produces must be read against that calibration AND the provenance of the
  CLIP weights (random weights ⇒ scores are mechanism-only).

`scripts/evaluate.py` and `scripts/run_eval_protocol.py` are thin CLIs over
this module.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .metrics import (
    Detection,
    clip_scores,
    object_recall,
    parse_gpt_ground_truth,
    parse_pkl_ground_truth,
    relation_accuracy,
    result_index,
)

CLIP_DETECTOR_CAVEAT = (
    "CLIP grid detector is a calibrated APPROXIMATION of the reference's "
    "detrex protocol: mechanism ceiling recall@IoU0.5=0.95 (oracle "
    "classifier), floor=0.0 (random embeddings) — "
    "scripts/calibrate_clip_detector.py, docs/EVALUATION.md"
)


def list_result_files(
    results_dir: str,
    prompt_range: Optional[Sequence[int]] = None,
    epoch: Optional[int] = None,
    seed: Optional[int] = None,
) -> List[str]:
    """Result images in reference naming (`final*_s*_index_*.png`), sorted.

    `prompt_range=(lo, hi)` keeps only indices in [lo, hi) — outdirs are
    reused across runs (`run_dataset.py` resumes, never clears), so a
    scorer that globs everything would silently fold a previous run's
    stale images into this run's denominators.

    `epoch` / `seed` filter on the `final{epoch}_s{seed}_` prefix exactly
    like the reference scorer (`detector_result_gpt.py:144` keeps only
    `"final2_s1_"`) — required when runners save per-epoch intermediates
    (`--save-epochs`), which would otherwise multiply the denominators."""
    files = sorted(
        f for f in os.listdir(results_dir) if result_index(f) is not None
    )
    if epoch is not None:
        files = [f for f in files if f.startswith(f"final{epoch}_")]
    if seed is not None:
        files = [f for f in files if f"_s{seed}_" in f]
    if prompt_range is not None:
        lo, hi = prompt_range
        files = [f for f in files if lo <= result_index(f) < hi]
    return files


def load_ground_truth(dataset: str, data_root: str):
    """(gt_objects, gt_relations) per prompt index, reference formats
    (`detector_result_gpt.py:36-93` gpt.txt blocks; pkl rows otherwise)."""
    if dataset == "gpt":
        return parse_gpt_ground_truth(os.path.join(data_root, "gpt.txt"))
    return parse_pkl_ground_truth(os.path.join(data_root, f"{dataset}.pkl"))


def build_clip_detector(
    clip_ckpt: Optional[str] = None,
    clip_vocab: Optional[str] = None,
    cfg=None,
    categories: Optional[Sequence[str]] = None,
    **detector_kw,
):
    """Construct a `CLIPDetector` over the full CLIP tower.  With no
    `clip_ckpt` the weights are RANDOM (generated on device) and any score
    is mechanism-only — callers must surface that.  Returns (detector,
    weights_provenance_str)."""
    import jax
    import jax.numpy as jnp

    from ..config import CLIPConfig
    from ..models.clip import CLIP
    from ..pipeline.frontend import COCO_CATEGORIES
    from ..utils import convert
    from ..utils.testing import randomize_params_on_device
    from ..utils.tokenizer import make_clip_tokenizer
    from .clip_detector import CLIPDetector

    cfg = cfg or CLIPConfig()
    clip_model = CLIP(cfg)
    if clip_ckpt:
        params = convert.convert_openai_clip(
            convert.load_torch_checkpoint(clip_ckpt)
        )
        provenance = clip_ckpt
    else:
        params = randomize_params_on_device(
            jax.eval_shape(
                clip_model.init, jax.random.PRNGKey(0),
                jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
                jnp.zeros((1, cfg.text.max_len), jnp.int32),
            )["params"],
            jax.random.PRNGKey(11),
        )
        provenance = "random"
    tok = make_clip_tokenizer(clip_vocab, max_len=cfg.text.max_len)
    tokenize = (
        tok.tokenize if hasattr(tok, "tokenize")
        else (lambda t: tok.pad_to(tok.encode(t), cfg.text.max_len))
    )
    det = CLIPDetector(
        clip_model, params, tokenize,
        categories=categories or COCO_CATEGORIES, **detector_kw,
    )
    return det, provenance


def build_clip_loss(
    clip_ckpt: Optional[str] = None,
    clip_vocab: Optional[str] = None,
    cfg=None,
):
    """Construct the CLIP-fidelity scorer (`DCLIPLoss`) + tokenizer the same
    way `build_clip_detector` builds the detector tower: real weights when
    `clip_ckpt` is given, device-random otherwise (provenance returned so
    callers flag it).  Returns (clip_loss, tokenize, provenance)."""
    import jax
    import jax.numpy as jnp

    from ..config import CLIPConfig
    from ..models.clip import CLIP
    from ..pipeline.losses import DCLIPLoss
    from ..utils import convert
    from ..utils.testing import randomize_params_on_device
    from ..utils.tokenizer import make_clip_tokenizer

    cfg = cfg or CLIPConfig()
    clip_model = CLIP(cfg)
    if clip_ckpt:
        params = convert.convert_openai_clip(
            convert.load_torch_checkpoint(clip_ckpt))
        provenance = clip_ckpt
    else:
        params = randomize_params_on_device(
            jax.eval_shape(
                clip_model.init, jax.random.PRNGKey(0),
                jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
                jnp.zeros((1, cfg.text.max_len), jnp.int32),
            )["params"],
            jax.random.PRNGKey(0),
        )
        provenance = "random"
    tok = make_clip_tokenizer(clip_vocab, max_len=cfg.text.max_len)
    tokenize = (
        tok.tokenize if hasattr(tok, "tokenize")
        else (lambda t: tok.pad_to(tok.encode(t), cfg.text.max_len))
    )
    return DCLIPLoss(clip_model, params), tokenize, provenance


def detect_folder(
    results_dir: str,
    detector,
    files: Optional[Sequence[str]] = None,
    top_per_category: int = 1,
    log=None,
) -> Dict[str, list]:
    """Run `detector` over every result image → the detections-JSON mapping
    (filename → [[x1, y1, x2, y2, category, score], ...]) that
    `scripts/evaluate.py --detections` consumes — so the CLIP route and the
    external-detrex route produce interchangeable artifacts."""
    from PIL import Image

    files = list(files) if files is not None else list_result_files(results_dir)
    out: Dict[str, list] = {}
    for f in files:
        img = np.asarray(
            Image.open(os.path.join(results_dir, f)).convert("RGB"), np.float32
        ) / 255.0
        dets = detector(img, top_per_category=top_per_category)
        out[f] = [
            [float(d.box[0]), float(d.box[1]), float(d.box[2]),
             float(d.box[3]), d.category, float(d.score)]
            for d in dets
        ]
        if log:
            log(f"{f}: {len(out[f])} detections")
    return out


def score_results(
    results_dir: str,
    dataset: str,
    data_root: str,
    detections: Dict[str, list],
    conf_recall: float = 0.4,
    conf_relation: float = 0.5,
    prompt_range: Optional[Sequence[int]] = None,
    epoch: Optional[int] = None,
    seed: Optional[int] = None,
) -> dict:
    """Protocol math over a detections mapping (reference thresholds:
    conf 0.4 for recall `detector_result_gpt.py:115`, 0.5 for relations
    `relation_result_gpt.py:95-110`; epoch/seed filter =
    `detector_result_gpt.py:144`'s "final2_s1_" keep-rule)."""
    gt_objects, gt_relations = load_ground_truth(dataset, data_root)
    files = list_result_files(results_dir, prompt_range, epoch=epoch, seed=seed)
    dets, objs, rels = [], [], []
    for f in files:
        idx = result_index(f)
        if idx >= len(gt_objects):
            raise ValueError(
                f"{f}: prompt index {idx} exceeds {dataset} GT size "
                f"{len(gt_objects)} — stale images from another dataset/run "
                "in this outdir? Pass prompt_range or clean the dir.")
        rows = detections.get(f, [])
        dets.append([Detection(tuple(r[:4]), r[4], r[5]) for r in rows])
        objs.append(gt_objects[idx])
        rels.append(gt_relations[idx])
    corr, cnt, rec = object_recall(dets, objs, conf_recall)
    rc, rn, racc = relation_accuracy(dets, rels, conf_relation)
    return {
        "n_images": len(files),
        "gt_objects": cnt,
        "generated_objects": corr,
        "object_recall": round(rec, 4),
        "relations_correct": rc,
        "relations_total": rn,
        "relation_accuracy": round(racc, 4),
        "conf_recall": conf_recall,
        "conf_relation": conf_relation,
    }


def clip_score_results(
    results_dir: str,
    dataset: str,
    data_root: str,
    clip_loss,
    tokenize,
    prompt_range: Optional[Sequence[int]] = None,
    epoch: Optional[int] = None,
    seed: Optional[int] = None,
) -> dict:
    """Mean CLIP fidelity over (image, prompt) pairs — the BASELINE.json
    north-star metric (reference computes it inside the method at
    `plms.py:204-293`; here it doubles as an offline eval)."""
    from PIL import Image

    from ..pipeline.runners import parse_gpt_prompts, parse_line_prompts

    if dataset == "gpt":
        prompts = parse_gpt_prompts(os.path.join(data_root, "gpt.txt"))
    else:
        prompts = parse_line_prompts(os.path.join(data_root, f"{dataset}.txt"))
    files = list_result_files(results_dir, prompt_range, epoch=epoch, seed=seed)
    scores = []
    for f in files:
        idx = result_index(f)
        if idx >= len(prompts):
            raise ValueError(
                f"{f}: prompt index {idx} exceeds {dataset} prompt count "
                f"{len(prompts)} — stale images in this outdir?")
        img = np.asarray(
            Image.open(os.path.join(results_dir, f)).convert("RGB"), np.float32
        )[None] / 255.0
        toks = np.asarray(tokenize(prompts[idx]), np.int32)[None]
        scores.append(float(clip_scores(clip_loss, img, toks)[0]))
    return {
        "mean_clip_score": round(float(np.mean(scores)), 4) if scores else None,
        "n_scored": len(scores),
    }
