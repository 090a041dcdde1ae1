"""VG/VG-MSDN batch inference + drawing + sg2im JSON export
(`inference/inference_vg_msdn.py:33-347`, `inference_coco.py:69-150`)."""
import json
import os

import jax
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.config import LayoutConfig
from diffusion_spacetime_attn_tpu.models.layout.model import create_layout_predictor
from diffusion_spacetime_attn_tpu.pipeline.frontend import LayoutInference
from diffusion_spacetime_attn_tpu.pipeline.vg_inference import (
    VGMSDNInference,
    scene_graph_to_words,
)
from diffusion_spacetime_attn_tpu.utils.tokenizer import make_roberta_tokenizer

TINY = LayoutConfig(vocab_size=50265, hidden=32, layers=1, heads=2,
                    ffn_dim=64, max_positions=64, max_len=32)

SG_MSDN = {
    "id": 1234,
    "width": 800, "height": 600,
    "objects": [{"class": "dog", "box": [0, 0, 100, 100]},
                {"class": "cat", "box": [200, 200, 300, 300]},
                {"class": "tree", "box": [400, 100, 500, 400]}],
    "relationships": [
        {"sub_id": 0, "obj_id": 1, "predicate": "next to"},
        {"sub_id": 1, "obj_id": 2, "predicate": "under"},
    ],
}

SG2IM = {
    "image_id": 77,
    "objects": ["sky", "mountain", "lake"],
    "relationships": [[0, "above", 1], [2, "below", 1]],
}


def test_scene_graph_to_words_both_formats():
    words, mention, names, triples = scene_graph_to_words(SG_MSDN)
    assert words == ["dog", "next", "to", "cat", ".", "cat", "under",
                     "tree", "."]
    assert names == ["dog", "cat", "tree"]
    # first mentions: dog@0, cat@3 (first mention wins), tree@7
    assert mention == [0, 3, 7]
    assert triples == [(0, "next to", 1), (1, "under", 2)]

    words2, mention2, names2, triples2 = scene_graph_to_words(SG2IM)
    assert names2 == ["sky", "mountain", "lake"]
    assert triples2 == [(0, "above", 1), (2, "below", 1)]


@pytest.fixture(scope="module")
def vg(tmp_path_factory):
    model, params = create_layout_predictor(TINY, jax.random.PRNGKey(0))
    li = LayoutInference(model, params, make_roberta_tokenizer(), TINY.max_len)
    save = tmp_path_factory.mktemp("vg_out")
    return VGMSDNInference(li, str(save))


def test_check_from_sg_writes_all_artifacts(vg, tmp_path):
    res = vg.check_from_sg(SG_MSDN, layout_save=str(tmp_path / "layouts"))
    assert os.path.exists(res["png"])
    assert os.path.exists(res["txt"])
    assert os.path.exists(res["json"])
    # drawn PNG has the 640x640 grey canvas of the reference
    from PIL import Image

    img = Image.open(res["png"])
    assert img.size == (640, 640)
    assert res["png"].endswith("_c_3.png")  # 3 boxes in the name

    sg2im = json.load(open(res["json"]))
    assert sg2im["objects"] == ["dog", "cat", "tree"]
    assert sg2im["relationships"] == [[0, "next to", 1], [1, "under", 2]]

    lines = open(res["txt"]).read().strip().split("\n")
    assert lines[0] == "dog[1] next to cat[2]"
    assert lines[1] == "cat[2] under tree[3]"

    lay = json.load(open(res["layout_json"]))
    assert lay["classes"] == ["dog", "cat", "tree"]
    assert lay["class_ids"] == [1, 2, 3]
    boxes = np.asarray(lay["boxes"])
    assert boxes.shape == (3, 4)
    # normalized by canvas width, clamped into the canvas
    assert (boxes >= 0).all() and (boxes <= 1.0).all()
    # xyxy ordering
    assert (boxes[:, 2] >= boxes[:, 0]).all()
    assert (boxes[:, 3] >= boxes[:, 1]).all()


def test_batched_run_matches_single(vg):
    """One [B, L] batched forward must equal per-sample calls."""
    sgs = [SG_MSDN, SG2IM, dict(SG_MSDN, id=999)]
    batched = vg.run(sgs, batch=3)
    singles = [vg.run([sg], batch=1)[0] for sg in sgs]
    for b, s in zip(batched, singles):
        np.testing.assert_allclose(
            np.asarray(b["centers"]), np.asarray(s["centers"]), atol=1e-5)


def test_run_handles_empty_scene_graph(vg):
    out = vg.run([{"id": 5, "objects": [], "relationships": []}, SG2IM])
    assert "skipped" in out[0]
    assert "png" in out[1]


def test_cli_runs_end_to_end(tmp_path):
    import subprocess
    import sys

    inst = tmp_path / "instances.json"
    inst.write_text(json.dumps([SG_MSDN, SG2IM]))
    out = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/infer_vg_msdn.py", "--instances", str(inst),
         "--out", str(out), "--layout-save", str(tmp_path / "lay"),
         "--tiny", "--cpu"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wrote 2/2 layouts" in r.stdout
    assert (out / "sg2im_json" / "1234.json").exists()
    assert (out / "sg2im_json" / "77.json").exists()
