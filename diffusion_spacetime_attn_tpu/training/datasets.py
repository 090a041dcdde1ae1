"""Layout-predictor dataset pipeline → fixed-shape `LayoutBatch` arrays.

Reference: `loader/COCODataset.py` `COCORelDataset` — a 2×2000-sample epoch:
first half GPT-3 synthetic captions with relation triples (hinge-loss
supervision), second half real COCO captions with absolute (x, y) GT
(GMM-NLL supervision).  The COCO half needs
`parsed_caption_label_dict.pkl`, a blob missing from the reference
(`.MISSING_LARGE_BLOBS:5`), so it is gated on file presence here too.

The reference materializes ragged Python lists per batch and loops in the
trainer; here each example is padded to (max_rels, max_objs) at load time so
batches are stackable numpy arrays, shardable over a data mesh.
"""
from __future__ import annotations

import dataclasses
import pickle
from typing import Iterator, List, Optional, Sequence

import numpy as np

from .losses import REL_TO_ID, LayoutBatch

GPT3_DEFAULT = (
    "/root/reference/layout_predictor/LayoutTransformer/data/gpt-3.pkl"
)


@dataclasses.dataclass
class LayoutExample:
    caption: str
    words: List[str]
    object_word_idx: List[int]            # word-level indices of objects
    relations: List[Sequence]             # [i_word, j_word, rel_name]
    abs_xy: Optional[List[Sequence]] = None  # [(word_idx, x, y)]


def load_gpt3_examples(path: str = GPT3_DEFAULT) -> List[LayoutExample]:
    """Parse gpt-3.pkl rows: [caption, words, obj_word_indices,
    [[i, j, rel]], noun_phrases] (`COCODataset.py:312-340`)."""
    with open(path, "rb") as f:
        rows = pickle.load(f)
    out = []
    for row in rows:
        caption, words, obj_idx, rels = row[0], row[1], row[2], row[3]
        out.append(
            LayoutExample(
                caption=caption,
                words=[w.strip() for w in words],
                object_word_idx=list(obj_idx),
                relations=[list(r) for r in rels],
            )
        )
    return out


def example_to_arrays(
    ex: LayoutExample,
    tokenizer,
    max_len: int = 128,
    max_rels: int = 8,
    max_objs: int = 8,
):
    """Tokenize with word alignment and pad to fixed shapes."""
    ids, align = tokenizer.encode_with_alignment(ex.words)
    tokens = np.asarray(tokenizer.pad_to(ids, max_len), np.int32)

    object_pos = np.zeros(max_len, np.float32)
    for w in ex.object_word_idx:
        if w < len(align) and align[w] < max_len:
            object_pos[align[w]] = 1.0

    rel_idx = np.zeros((max_rels, 2), np.int32)
    rel_type = np.zeros(max_rels, np.int32)
    rel_valid = np.zeros(max_rels, np.float32)
    for r, (i, j, rel) in enumerate(ex.relations[:max_rels]):
        if rel not in REL_TO_ID or i >= len(align) or j >= len(align):
            continue
        ti, tj = align[i], align[j]
        if ti >= max_len or tj >= max_len:
            continue
        rel_idx[r] = (ti, tj)
        rel_type[r] = REL_TO_ID[rel]
        rel_valid[r] = 1.0

    abs_idx = np.zeros(max_objs, np.int32)
    abs_xy = np.zeros((max_objs, 2), np.float32)
    abs_valid = np.zeros(max_objs, np.float32)
    if ex.abs_xy:
        for o, (w, x, y) in enumerate(ex.abs_xy[:max_objs]):
            if w >= len(align) or align[w] >= max_len:
                continue
            abs_idx[o] = align[w]
            abs_xy[o] = (x, y)
            abs_valid[o] = 1.0

    return dict(
        tokens=tokens, object_pos=object_pos,
        rel_idx=rel_idx, rel_type=rel_type, rel_valid=rel_valid,
        abs_idx=abs_idx, abs_xy=abs_xy, abs_valid=abs_valid,
    )


def batches(
    examples: List[LayoutExample],
    tokenizer,
    batch_size: int,
    rng: np.random.RandomState,
    max_len: int = 128,
    max_rels: int = 8,
    max_objs: int = 8,
    epochs: int = 1,
    drop_last: bool = True,
) -> Iterator[LayoutBatch]:
    """Shuffled, stacked fixed-shape batches."""
    arrays = [
        example_to_arrays(ex, tokenizer, max_len, max_rels, max_objs)
        for ex in examples
    ]
    n = len(arrays)
    for _ in range(epochs):
        order = rng.permutation(n)
        end = n - (n % batch_size) if drop_last else n
        for s in range(0, end, batch_size):
            idx = order[s : s + batch_size]
            yield LayoutBatch(
                **{
                    k: np.stack([arrays[i][k] for i in idx])
                    for k in arrays[0]
                }
            )


def load_coco_caption_examples(
    instances_path: str,
    captions_path: str,
    min_objects: int = 3,
    max_objects: int = 8,
    min_area_frac: float = 0.02,
    max_images: Optional[int] = None,
) -> List[LayoutExample]:
    """Absolute-target examples from raw COCO annotation JSONs.

    This restores the second half of the reference's training epoch
    (`COCODataset.py:341-366`: real captions with absolute (x, y) GT) —
    dead in the reference because its preprocessed
    `parsed_caption_label_dict.pkl` blob is missing
    (`.MISSING_LARGE_BLOBS:5`).  Filters mirror `COCODataset.py:219-250`:
    object area > min_area_frac of the image, 3–8 objects per image.
    Object words are matched to annotated categories by name mention.

    Uses stdlib json (pycocotools is not required for this subset).
    """
    import json as _json

    from ..pipeline.frontend import simple_words

    with open(instances_path) as f:
        inst = _json.load(f)
    with open(captions_path) as f:
        caps = _json.load(f)

    cat_name = {c["id"]: c["name"] for c in inst["categories"]}
    img_size = {i["id"]: (i["width"], i["height"]) for i in inst["images"]}
    objects_by_img = {}
    for a in inst["annotations"]:
        w, h = img_size[a["image_id"]]
        bx, by, bw, bh = a["bbox"]
        if bw * bh < min_area_frac * w * h:
            continue
        objects_by_img.setdefault(a["image_id"], []).append(
            (cat_name[a["category_id"]], (bx + bw / 2) / w, (by + bh / 2) / h)
        )
    caption_by_img = {}
    for a in caps["annotations"]:
        caption_by_img.setdefault(a["image_id"], a["caption"])

    out = []
    for img_id, objs in objects_by_img.items():
        if not (min_objects <= len(objs) <= max_objects):
            continue
        caption = caption_by_img.get(img_id)
        if not caption:
            continue
        words = simple_words(caption)
        low = [w.lower() for w in words]
        abs_xy, used = [], set()
        for name, cx, cy in objs:
            head = name.split()[-1]
            for wi, w in enumerate(low):
                if wi in used:
                    continue
                if w == head or w == head + "s" or w == head + "es":
                    abs_xy.append((wi, cx, cy))
                    used.add(wi)
                    break
        if not abs_xy:
            continue
        out.append(
            LayoutExample(
                caption=caption,
                words=words,
                object_word_idx=[a[0] for a in abs_xy],
                relations=[],
                abs_xy=abs_xy,
            )
        )
        if max_images and len(out) >= max_images:
            break
    return out


COCO_STA_DEFAULT = (
    "/root/reference/layout_predictor/LayoutTransformer/data/coco/"
    "annotations/sta_dict.json"
)


def attach_sampled_abs_targets(
    examples: List[LayoutExample],
    sta_path: str = COCO_STA_DEFAULT,
    rng: Optional[np.random.RandomState] = None,
    margin: float = 0.2,
) -> List[LayoutExample]:
    """Give relation-only examples sampled absolute (x, y) targets.

    The reference's epoch is half GPT-3 relation captions (hinge loss) and
    half real COCO captions with absolute GT centers (GMM NLL) — but the
    COCO half's `parsed_caption_label_dict.pkl` is a missing blob
    (`.MISSING_LARGE_BLOBS:5`) and the raw COCO annotation JSONs are not in
    this environment either.  Without ANY absolute supervision the GMM
    means are unanchored (the hinge constrains only pairwise differences,
    `trainer/loss.py:315-333`), so predicted centers can drift out of
    [0, 1].  Substitute: sample per-object centers from the reference's own
    recorded COCO statistics (`sta_dict.json` x/y mean+std — the file the
    reference itself dumps at `COCODataset.py:219-250`), then repair them
    to satisfy every relation triple at the hinge margin so the two loss
    terms never conflict.  Deterministic given `rng`.
    """
    import json

    with open(sta_path) as f:
        sta = json.load(f)
    rng = rng or np.random.RandomState(0)
    out = []
    for ex in examples:
        xy = {}
        for w in ex.object_word_idx:
            x = float(np.clip(rng.normal(sta["x_mean"], sta["x_std"]), 0.05, 0.95))
            y = float(np.clip(rng.normal(sta["y_mean"], sta["y_std"]), 0.05, 0.95))
            xy[w] = [x, y]
        # repair pass: order each related pair along the relation axis and
        # push to >= margin separation (i REL j semantics, y down — matches
        # hinge_relation_loss direction conventions)
        for _ in range(4):  # few sweeps settle multi-relation chains
            for i, j, rel in ex.relations:
                if rel not in REL_TO_ID or i not in xy or j not in xy:
                    continue
                axis = 1 if rel in ("above", "below") else 0
                lo_idx, hi_idx = ((i, j) if rel in ("above", "left of")
                                  else (j, i))
                lo, hi = xy[lo_idx][axis], xy[hi_idx][axis]
                if hi - lo < margin:
                    mid = float(np.clip(0.5 * (lo + hi),
                                        0.02 + margin / 2, 0.98 - margin / 2))
                    xy[lo_idx][axis] = mid - margin / 2
                    xy[hi_idx][axis] = mid + margin / 2
        out.append(
            dataclasses.replace(
                ex,
                abs_xy=[(w, v[0], v[1]) for w, v in xy.items()],
            )
        )
    return out


def close_relations_transitively(
    examples: List[LayoutExample],
    max_rels: int = 8,
) -> List[LayoutExample]:
    """Append transitively inferred relation triples to each example.

    The deployed consistency protocol's gpt failures concentrate on
    chained phrasings ("the dog is left of the horse, the horse is right
    of the elephant" ⇒ GT "dog left of elephant"): gpt-3.pkl rows carry
    only the surface triples, so the model never sees chain-implied
    supervision.  Spatial relations are transitive per axis — normalize
    each triple to its canonical direction ("below" ⇒ reversed "above",
    "right of" ⇒ reversed "left of"), close each axis graph to fixpoint,
    and append the inferred pairs as extra hinge supervision (capped at
    `max_rels`, the fixed batch width).  Pairs whose inverse is also in
    the closure (contradictory source triples) are skipped.  Relations
    here are word-index triples, so the augmentation is purely
    label-side — no eval text enters training.
    """
    out = []
    for ex in examples:
        have = {tuple(r) for r in ex.relations}
        edges = {"above": set(), "left of": set()}
        for i, j, rel in ex.relations:
            if rel in edges:
                edges[rel].add((i, j))
            elif rel == "below":
                edges["above"].add((j, i))
            elif rel == "right of":
                edges["left of"].add((j, i))
        new_rels = [list(r) for r in ex.relations]
        for rel, e in edges.items():
            closure = set(e)
            changed = True
            while changed:  # tiny graphs (≤8 nodes): fixpoint iteration
                changed = False
                for a, b in list(closure):
                    for c, d in list(closure):
                        if b == c and a != d and (a, d) not in closure:
                            closure.add((a, d))
                            changed = True
            inv = "below" if rel == "above" else "right of"
            for a, b in sorted(closure - e):
                if (b, a) in closure:  # contradictory chain — ambiguous
                    continue
                if (a, b, rel) in have or (b, a, inv) in have:
                    continue
                if len(new_rels) >= max_rels:
                    break
                new_rels.append([a, b, rel])
                have.add((a, b, rel))
        out.append(dataclasses.replace(ex, relations=new_rels)
                   if len(new_rels) != len(ex.relations) else ex)
    return out


# Template paraphrases per relation, as word lists with {a}/{b} slots.
# Plain copula syntax on purpose: gpt-3.pkl supervision is all long
# descriptive prose, and the predictor's weakest phrasings in the deployed
# protocol are the short forms (vsr-style "The X is below the Y.").
REL_TEMPLATES = {
    "above": [
        "The {a} is above the {b} .",
        "The {a} was perched above the {b} .",
        "A {a} above a {b} .",
    ],
    "below": [
        "The {a} is below the {b} .",
        "The {a} was situated beneath the {b} .",
        "A {a} below a {b} .",
    ],
    "left of": [
        "The {a} is to the left of the {b} .",
        "The {a} was placed to the left of the {b} .",
        "A {a} on the left side of the {b} .",
    ],
    "right of": [
        "The {a} is to the right of the {b} .",
        "The {a} was placed to the right of the {b} .",
        "A {a} on the right side of the {b} .",
    ],
}


def augment_with_templates(
    examples: List[LayoutExample],
    rng: np.random.RandomState,
    variants: int = 1,
) -> List[LayoutExample]:
    """Paraphrase each supervised relation into `variants` template
    sentences (drawn without replacement from `REL_TEMPLATES[rel]`).

    Uses ONLY the example's own (object word, relation) supervision — no
    eval data enters training.  Augmented examples carry hinge supervision
    only (no `abs_xy` anchors): the point is relation→geometry robustness
    across phrasings, not more absolute-position targets.  Apply to the
    TRAIN split only, after the val split, so val metrics stay comparable
    to un-augmented runs."""
    out: List[LayoutExample] = []
    for ex in examples:
        for i, j, rel in ex.relations:
            ts = REL_TEMPLATES.get(rel)
            if ts is None or i >= len(ex.words) or j >= len(ex.words):
                continue
            a, b = ex.words[i].strip(), ex.words[j].strip()
            if not a or not b:
                continue
            picks = rng.choice(
                len(ts), size=min(variants, len(ts)), replace=False)
            for p in picks:
                tw = ts[p].split()
                ia, ib = tw.index("{a}"), tw.index("{b}")
                words = [a if w == "{a}" else b if w == "{b}" else w
                         for w in tw]
                out.append(LayoutExample(
                    caption=" ".join(words),
                    words=words,
                    object_word_idx=[ia, ib],
                    relations=[[ia, ib, rel]],
                ))
    return out


def synthetic_examples(n: int, rng: np.random.RandomState) -> List[LayoutExample]:
    """Tiny synthetic relation corpus for tests: 'the A is REL the B'."""
    nouns = ["dog", "cat", "car", "tree", "bird", "cup", "chair", "lamp"]
    rels = list(REL_TO_ID.keys())
    out = []
    for _ in range(n):
        a, b = rng.choice(nouns, 2, replace=False)
        rel = rels[rng.randint(len(rels))]
        words = ["the", a, "is"] + rel.split() + ["the", b]
        i, j = 1, len(words) - 1
        out.append(
            LayoutExample(
                caption=" ".join(words),
                words=words,
                object_word_idx=[i, j],
                relations=[[i, j, rel]],
                abs_xy=[(i, rng.rand(), rng.rand()), (j, rng.rand(), rng.rand())],
            )
        )
    return out


# --- VG-MSDN (Visual Genome scene graphs) ---------------------------------

# VG predicates that map onto the hinge-loss spatial relations
# (`trainer/loss.py:315-333` supervises exactly above/below/left/right)
VG_PRED_TO_REL = {
    "above": "above", "over": "above", "on": "above", "on top of": "above",
    "below": "below", "under": "below", "beneath": "below",
    "underneath": "below",
    "left of": "left of", "to the left of": "left of",
    "right of": "right of", "to the right of": "right of",
}


def load_vg_msdn_examples(
    instances_json_path: str,
    limit: Optional[int] = None,
    max_triples: int = 8,
) -> List[LayoutExample]:
    """Parse VG-MSDN scene-graph instances into `LayoutExample`s.

    Reference: `loader/VGmsdnDataset.py:24-157` — each record is
    `{id, path, width, height, objects: [{class, box: [x0,y0,x1,y1]}],
    relationships: [{sub_id, obj_id, predicate}]}`; the reference builds a
    `[CLS] sub pred obj [SEP] …` sentence in its own closed vocab for the
    legacy discrete decoders (unreachable from `build_model`, which only
    constructs `Rel2Bbox`).  Here the triples become a natural-language
    triple sentence consumed by the *live* Rel2Bbox path: spatial predicates
    supervise the hinge relations, and every mentioned object carries its GT
    normalized (xc, yc) center for the GMM-NLL half — the same two-loss
    split as the COCO epoch (`trainer/Pretrain.py:199-233`).
    """
    import json as _json

    with open(instances_json_path) as f:
        data = _json.load(f)
    out: List[LayoutExample] = []
    for img in data[: limit or len(data)]:
        W, H = float(img["width"]), float(img["height"])
        objs = img.get("objects", [])
        rels = img.get("relationships", [])
        if not rels or not objs or W <= 0 or H <= 0:
            continue
        words: List[str] = []
        relations: List[Sequence] = []
        first_mention = {}          # obj_id -> word index of first mention
        for rel in rels[:max_triples]:
            s, o = rel["sub_id"], rel["obj_id"]
            if s >= len(objs) or o >= len(objs):
                continue
            si = len(words)
            words.extend(str(objs[s]["class"]).split())
            words.extend(str(rel["predicate"]).split())
            oi = len(words)
            words.extend(str(objs[o]["class"]).split())
            words.append(".")
            rname = VG_PRED_TO_REL.get(str(rel["predicate"]).lower().strip())
            if rname is not None:
                relations.append([si, oi, rname])
            for wi, obj_id in ((si, s), (oi, o)):
                first_mention.setdefault(obj_id, wi)
        if not first_mention:
            continue
        abs_xy = []
        for obj_id, wi in first_mention.items():
            x0, y0, x1, y1 = objs[obj_id]["box"]
            abs_xy.append((wi, (x0 + x1) / (2.0 * W), (y0 + y1) / (2.0 * H)))
        out.append(
            LayoutExample(
                caption=" ".join(words),
                words=words,
                object_word_idx=[wi for wi, _, _ in abs_xy],
                relations=relations,
                abs_xy=abs_xy,
            )
        )
    return out
