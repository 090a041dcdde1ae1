"""Full user-facing protocol, end to end: `run_dataset.py --mode spacetime`
→ final PNGs (reference naming) → synthetic detections JSON →
`scripts/evaluate.py` → recall/relation values matching hand-computed
expectations (`detector_result_gpt.py:95-166`, `relation_result_gpt.py`).

This pins the whole loop, not just the unit math: prompt parsing ([10:]
slice), layout frontend, spacetime optimization, image writing/naming,
manifest resume bookkeeping, detections ingestion, and the two protocol
metrics."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GPT_TXT = """Objects: big dog, small cat
Relation: big dog left of small cat
Sentence: a big dog left of a small cat

Objects: person, dog
Relation: person above dog
Sentence: a person above a dog

"""


@pytest.fixture(scope="module")
def sweep(tmp_path_factory):
    root = tmp_path_factory.mktemp("proto")
    (root / "gpt.txt").write_text(GPT_TXT)
    out = root / "results"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/run_dataset.py", "--dataset", "gpt",
         "--data-root", str(root), "--mode", "spacetime", "--tiny", "--cpu",
         "--steps", "2", "--end", "2", "--outdir", str(out), "--sampler",
         "dpm"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return root, out


def test_sweep_writes_reference_named_pngs_and_manifest(sweep):
    root, out = sweep
    # tiny config runs epochs=2 → saved at epoch index 1 (reference saves at
    # its final epoch, `plms.py:280-288`)
    files = sorted(f for f in os.listdir(out) if f.endswith(".png"))
    assert files == ["final1_s1_index_0.png", "final1_s1_index_1.png"]
    manifest = json.load(open(out / "manifest_gpt.json"))
    assert manifest["done"] == [0, 1]
    from PIL import Image

    img = Image.open(out / files[0])
    assert img.size == (32, 32)


def test_evaluate_protocol_values_match_hand_computation(sweep):
    root, out = sweep
    files = sorted(f for f in os.listdir(out) if f.endswith(".png"))
    # hand-constructed detections:
    #  image 0: dog center x=20 < cat center x=70 → "dog left of cat" PASSES;
    #           both conf ≥ 0.5 → recall 2/2, relation 1/1
    #  image 1: person conf 0.45 — counts for recall (conf 0.4) but is
    #           FILTERED from the relation check (conf 0.5) → recall 2/2,
    #           relation 0/1 (person missing at conf 0.5)
    dets = {
        files[0]: [[10, 10, 30, 30, "dog", 0.9],
                   [60, 10, 80, 30, "cat", 0.8]],
        files[1]: [[10, 50, 30, 70, "person", 0.45],
                   [10, 5, 30, 25, "dog", 0.9]],
    }
    det_path = root / "detections.json"
    det_path.write_text(json.dumps(dets))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/evaluate.py", "--results", str(out),
         "--dataset", "gpt", "--data-root", str(root),
         "--detections", str(det_path)],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "All object numbers: 4" in r.stdout
    assert "Generated object numbers: 4" in r.stdout
    assert "object recall: 1.0000" in r.stdout
    assert "relation accuracy: 0.5000 (1/2)" in r.stdout


def test_resume_skips_completed(sweep):
    root, out = sweep
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/run_dataset.py", "--dataset", "gpt",
         "--data-root", str(root), "--mode", "spacetime", "--tiny", "--cpu",
         "--steps", "2", "--end", "2", "--outdir", str(out), "--resume",
         "--sampler", "dpm"],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "resuming: 2 prompts already complete" in r.stdout


def test_clip_detector_route_produces_interchangeable_artifact(sweep):
    """`evaluate.py --detector clip` (the gated on-TPU route, VERDICT r3
    weak #2/next-#4): must print the calibration caveat, flag random
    weights, dump a detections JSON interchangeable with the external
    route, and write the full report JSON."""
    root, out = sweep
    det_path = root / "detections_clip.json"
    rep_path = root / "report.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/evaluate.py", "--results", str(out),
         "--dataset", "gpt", "--data-root", str(root),
         "--detector", "clip", "--tiny", "--cpu",
         "--dump-detections", str(det_path), "--json-out", str(rep_path)],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "calibrated APPROXIMATION" in r.stderr
    assert "random CLIP weights" in r.stderr
    report = json.load(open(rep_path))
    assert report["detector_weights"] == "random"
    assert 0.0 <= report["object_recall"] <= 1.0
    assert 0.0 <= report["relation_accuracy"] <= 1.0
    # the dumped JSON feeds back through the external-detections route
    dets = json.load(open(det_path))
    assert set(dets) == {"final1_s1_index_0.png", "final1_s1_index_1.png"}
    for rows in dets.values():
        for x1, y1, x2, y2, cat, score in rows:
            assert 0 <= x1 < x2 <= 32 and 0 <= y1 < y2 <= 32
            assert isinstance(cat, str) and 0.0 <= score <= 1.0
    r2 = subprocess.run(
        [sys.executable, "scripts/evaluate.py", "--results", str(out),
         "--dataset", "gpt", "--data-root", str(root),
         "--detections", str(det_path), "--cpu"],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert f"object recall: {report['object_recall']:.4f}" in r2.stdout


def test_run_eval_protocol_one_command(tmp_path):
    """The one-command generate→detect→score loop (VERDICT r3 next-#1),
    tiny/CPU: artifact JSON must carry the numbers AND the provenance
    flags that make random-weight runs self-describing."""
    (tmp_path / "gpt.txt").write_text(GPT_TXT)
    out = tmp_path / "results"
    art = tmp_path / "EVAL_tiny.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/run_eval_protocol.py", "--dataset", "gpt",
         "--data-root", str(tmp_path), "--end", "2", "--steps", "2",
         "--batch-size", "1", "--sampler", "dpm", "--outdir", str(out),
         "--out", str(art), "--tiny", "--cpu"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    a = json.load(open(art))
    assert a["sd_weights"] == "random"
    assert a["detector_weights"] == "random"
    assert a["clip_score_weights"] == "random"
    assert a["n_images"] == 2
    assert a["sampler"] == "dpm2"
    assert 0.0 <= a["object_recall"] <= 1.0
    assert a["relations_total"] == 2
    assert a["mean_clip_score"] is not None
    assert os.path.exists(a["detections_json"])
    assert a["detector_calibration"]["oracle_recall_iou50"] == 0.95


def test_eval_layout_consistency_one_command(tmp_path):
    """`scripts/eval_layout_consistency.py` end to end on a 2-record gpt
    fixture with random weights: the artifact must carry the per-row
    counting fields and the real frontend path must cover both objects
    (docs/EVALUATION.md layout relation consistency)."""
    (tmp_path / "gpt.txt").write_text(GPT_TXT)
    art = tmp_path / "LAYOUT_EVAL_tiny.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/eval_layout_consistency.py", "--dataset",
         "gpt", "--data-root", str(tmp_path), "--end", "2", "--cpu",
         "--ckpt", "random", "--out", str(art)],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    a = json.load(open(art))
    assert a["chance_level"] == 0.5
    t = a["trained"]
    assert t["weights"] == "random"
    assert t["relations_total"] == 2
    # 'dog'/'cat'/'person' are COCO categories the n-gram frontend finds
    assert t["relations_evaluated"] == 2
    assert 0 <= t["relations_satisfied"] <= 2
    assert t["relation_object_coverage"] == 1.0


def test_compare_outputs_drift_tool(tmp_path):
    """scripts/compare_outputs.py: identical dirs -> zero drift; a shifted
    copy -> the exact hand-computed MAE; JSON line parses."""
    import numpy as np
    from PIL import Image

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)
    Image.fromarray(img).save(a / "final2_s1_index_0.png")
    Image.fromarray(img).save(b / "final2_s1_index_0.png")
    shifted = np.clip(img.astype(np.int16) + 3, 0, 255).astype(np.uint8)
    Image.fromarray(img).save(a / "final2_s1_index_1.png")
    Image.fromarray(shifted).save(b / "final2_s1_index_1.png")
    Image.fromarray(img).save(a / "only_a.png")  # unmatched: counted, not compared

    r = subprocess.run(
        [sys.executable, "scripts/compare_outputs.py", str(a), str(b),
         "--json"],
        capture_output=True, text=True, timeout=120, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip())
    assert s["n_images"] == 2 and s["only_in_a"] == 1 and s["only_in_b"] == 0
    expected = float(np.abs(shifted.astype(np.float32) - img) .mean()) / 255.0
    assert abs(s["worst_mae"] - expected) < 1e-6
    assert s["mean_mae"] == pytest.approx(expected / 2, abs=1e-6)
    assert s["worst_maxdiff"] == pytest.approx(3 / 255.0, abs=1e-6)


def test_list_result_files_epoch_seed_filter(tmp_path):
    """Per-epoch intermediates (`--save-epochs`) must not leak into the
    scorer: the reference keeps only `final2_s1_` (`detector_result_gpt.py:144`)."""
    from diffusion_spacetime_attn_tpu.eval.protocol import list_result_files

    names = [
        "final0_s1_index_0.png", "final1_s1_index_0.png",
        "final2_s1_index_0.png", "final2_s1_index_1.png",
        "final2_s7_index_2.png", "not_a_result.png",
    ]
    for n in names:
        (tmp_path / n).write_bytes(b"")
    assert list_result_files(str(tmp_path)) == sorted(names[:5])
    assert list_result_files(str(tmp_path), epoch=2, seed=1) == [
        "final2_s1_index_0.png", "final2_s1_index_1.png"]
    assert list_result_files(str(tmp_path), epoch=2, seed=7) == [
        "final2_s7_index_2.png"]
    assert list_result_files(str(tmp_path), (0, 1), epoch=2, seed=1) == [
        "final2_s1_index_0.png"]


def test_save_epochs_writes_per_epoch_images(tmp_path):
    """`--save-epochs` reproduces the reference's per-epoch artifact
    contract (`plms.py:280-288` saves final{0,1,2}); the one-command
    protocol still scores ONLY the last epoch."""
    (tmp_path / "gpt.txt").write_text(GPT_TXT)
    out = tmp_path / "results"
    art = tmp_path / "EVAL_tiny.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/run_eval_protocol.py", "--dataset", "gpt",
         "--data-root", str(tmp_path), "--end", "2", "--steps", "2",
         "--batch-size", "2", "--sampler", "dpm", "--outdir", str(out),
         "--out", str(art), "--tiny", "--cpu", "--save-epochs"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    files = sorted(f for f in os.listdir(out) if f.endswith(".png"))
    # tiny config: epochs=2 → final0 (epoch-0 forward) + final1 (saved last)
    assert files == [
        "final0_s1_index_0.png", "final0_s1_index_1.png",
        "final1_s1_index_0.png", "final1_s1_index_1.png"]
    a = json.load(open(art))
    assert a["n_images"] == 2  # only the last epoch enters the denominators
    # calibration now sourced from the committed artifact (ADVICE r4)
    assert "DETECTOR_CALIBRATION.json" in a["detector_calibration"]["source"]
