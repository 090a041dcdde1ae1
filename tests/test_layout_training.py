import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.config import LayoutConfig, LayoutTrainConfig
from diffusion_spacetime_attn_tpu.models.layout.gmm_head import (
    gmm_log_likelihood,
    sample_xy,
    split_gmm,
)
from diffusion_spacetime_attn_tpu.models.layout.model import create_layout_predictor
from diffusion_spacetime_attn_tpu.training.datasets import (
    batches,
    synthetic_examples,
)
from diffusion_spacetime_attn_tpu.training.layout_trainer import LayoutTrainer
from diffusion_spacetime_attn_tpu.training.losses import (
    REL_TO_ID,
    LayoutBatch,
    hinge_relation_loss,
)
from diffusion_spacetime_attn_tpu.training.schedules import bert_schedule
from diffusion_spacetime_attn_tpu.utils.tokenizer import make_roberta_tokenizer

TINY = LayoutConfig(
    vocab_size=50265, hidden=32, layers=2, heads=2, ffn_dim=64,
    max_positions=140, max_len=16,
)


def reference_bert_scheduler(max_lr, min_lr, warm, hold, decay, steps):
    """numpy replication of `trainer/scheduler.py:86-131`."""
    lrs, t = [], 0
    for _ in range(steps):
        t += 1
        if t < warm:
            lr = 0.1 * max_lr + (max_lr - 0.1 * max_lr) / warm * t
        elif t < warm + hold:
            lr = max_lr
        else:
            lr = -((t - (warm + hold)) * (max_lr / decay)) + max_lr
        lrs.append(max(lr, min_lr))
    return np.array(lrs)


def test_bert_schedule_matches_reference():
    sched = bert_schedule(4e-5, 1e-8, 50, 10, 1000)
    got = np.array([float(sched(jnp.int32(s))) for s in range(200)])
    expect = reference_bert_scheduler(4e-5, 1e-8, 50, 10, 1000, 200)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_hinge_loss_matches_reference_formula():
    """Scalar replication of `loss.py:315-333`."""
    rng = np.random.RandomState(0)
    gmm = rng.randn(1, 6, 30).astype(np.float32)
    for rel, rid in REL_TO_ID.items():
        batch = LayoutBatch(
            tokens=np.zeros((1, 6), np.int32),
            object_pos=np.zeros((1, 6), np.float32),
            rel_idx=np.array([[[2, 4]]], np.int32),
            rel_type=np.array([[rid]], np.int32),
            rel_valid=np.ones((1, 1), np.float32),
            abs_idx=np.zeros((1, 1), np.int32),
            abs_xy=np.zeros((1, 1, 2), np.float32),
            abs_valid=np.zeros((1, 1), np.float32),
        )
        got = float(hinge_relation_loss(jnp.array(gmm), batch))
        b1, b2 = gmm[0, 2], gmm[0, 4]
        if rel == "above":
            diff = b1[10:15].max() - b2[10:15].min()
        elif rel == "below":
            diff = b2[10:15].max() - b1[10:15].min()
        elif rel == "left of":
            diff = b1[5:10].max() - b2[5:10].min()
        else:
            diff = b2[5:10].max() - b1[5:10].min()
        np.testing.assert_allclose(got, max(diff, -0.2), rtol=1e-5)


def test_gmm_nll_matches_torch_reference():
    """Replicate `Customized_Gmm_Loss.pdf` (`loss.py:357-381`) in numpy."""
    rng = np.random.RandomState(1)
    raw = rng.randn(4, 30).astype(np.float32)
    xy = rng.rand(4, 2).astype(np.float32)
    got = np.asarray(gmm_log_likelihood(jnp.array(raw), jnp.array(xy)))

    pi = raw[:, :5]
    pi = np.exp(pi - pi.max(-1, keepdims=True))
    pi /= pi.sum(-1, keepdims=True)
    ux, uy = raw[:, 5:10], raw[:, 10:15]
    sx, sy = np.exp(raw[:, 15:20]), np.exp(raw[:, 20:25])
    rho = np.tanh(raw[:, 25:30])
    x, y = xy[:, :1], xy[:, 1:2]
    zx = ((x - ux) / sx) ** 2
    zy = ((y - uy) / sy) ** 2
    zxy = (x - ux) * (y - uy) / (sx * sy)
    z = zx + zy - 2 * rho * zxy
    a = -z / (2 * (1 - rho ** 2))
    norm = np.clip(2 * np.pi * sx * sy * np.sqrt(1 - rho ** 2), 1e-5, None)
    expect = np.log((pi * np.exp(a) / norm).sum(-1) + 1e-5)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_sample_xy_greedy_is_argmax_component_mean():
    rng = np.random.RandomState(2)
    raw = rng.randn(3, 30).astype(np.float32)
    xy = np.asarray(sample_xy(jnp.array(raw), greedy_component=True))
    p = split_gmm(jnp.array(raw))
    idx = np.argmax(np.asarray(p.pi), -1)
    for i in range(3):
        np.testing.assert_allclose(xy[i, 0], np.asarray(p.mu_x)[i, idx[i]])
        np.testing.assert_allclose(xy[i, 1], np.asarray(p.mu_y)[i, idx[i]])


def test_training_reduces_loss_and_satisfies_relations():
    """End-to-end: a tiny predictor trained on synthetic relations learns to
    place objects consistently with the relation."""
    rng = np.random.RandomState(0)
    model, params = create_layout_predictor(TINY, jax.random.PRNGKey(0))
    tok = make_roberta_tokenizer()
    train_cfg = LayoutTrainConfig(
        batch_size=16, encoder_max_lr=1e-4, head_max_lr=3e-3,
        warmup_steps=5, hold_steps=5, decay_steps=10000,
    )
    trainer = LayoutTrainer.create(TINY, train_cfg, params)
    opt_state = trainer.init_state(params)

    examples = synthetic_examples(64, rng)
    losses = []
    for batch in batches(
        examples, tok, 16, rng, max_len=16, max_rels=2, max_objs=2, epochs=30
    ):
        params, opt_state, loss, _ = trainer.train_step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 1.0, (losses[0], losses[-1])

    # check relation satisfaction on a training example (mechanism, not
    # generalization — the corpus is 64 random sentences)
    ex = examples[0]
    from diffusion_spacetime_attn_tpu.training.datasets import example_to_arrays

    arr = example_to_arrays(ex, tok, 16, 2, 2)
    gmm = model.apply(
        {"params": params},
        jnp.array(arr["tokens"])[None],
        jnp.array(arr["object_pos"])[None],
    )
    xy = np.asarray(sample_xy(gmm, greedy_component=True))[0]
    t1, t2 = arr["rel_idx"][0]
    rel = ex.relations[0][2]
    p1, p2 = xy[t1], xy[t2]
    if rel == "above":
        assert p1[1] < p2[1]
    elif rel == "below":
        assert p1[1] > p2[1]
    elif rel == "left of":
        assert p1[0] < p2[0]
    else:
        assert p1[0] > p2[0]


def test_checkpoint_roundtrip(tmp_path):
    model, params = create_layout_predictor(TINY, jax.random.PRNGKey(0))
    train_cfg = LayoutTrainConfig()
    trainer = LayoutTrainer.create(TINY, train_cfg, params)
    opt_state = trainer.init_state(params)
    trainer.save_checkpoint(str(tmp_path), 5, params, opt_state)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored, _ = trainer.restore_checkpoint(str(tmp_path), 5, zeroed, opt_state)
    leaves_a = jax.tree_util.tree_leaves(params)
    leaves_b = jax.tree_util.tree_leaves(restored)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_coco_caption_examples(tmp_path):
    """COCO-annotation parsing with a minimal synthetic fixture."""
    import json

    from diffusion_spacetime_attn_tpu.training.datasets import (
        load_coco_caption_examples,
    )

    inst = {
        "images": [{"id": 1, "width": 100, "height": 100},
                   {"id": 2, "width": 100, "height": 100}],
        "categories": [{"id": 5, "name": "dog"}, {"id": 6, "name": "cat"},
                       {"id": 7, "name": "car"}],
        "annotations": [
            {"image_id": 1, "category_id": 5, "bbox": [10, 10, 30, 30]},
            {"image_id": 1, "category_id": 6, "bbox": [60, 60, 30, 30]},
            {"image_id": 1, "category_id": 7, "bbox": [40, 0, 40, 40]},
            {"image_id": 1, "category_id": 7, "bbox": [0, 0, 1, 1]},   # too small
            {"image_id": 2, "category_id": 5, "bbox": [0, 0, 50, 50]},  # only 1 obj
        ],
    }
    caps = {
        "annotations": [
            {"image_id": 1, "caption": "A dog and a cat near a car."},
            {"image_id": 2, "caption": "A dog."},
        ]
    }
    ip, cp = tmp_path / "inst.json", tmp_path / "caps.json"
    ip.write_text(json.dumps(inst))
    cp.write_text(json.dumps(caps))
    ex = load_coco_caption_examples(str(ip), str(cp), min_objects=3)
    assert len(ex) == 1  # image 2 filtered (1 object)
    e = ex[0]
    assert e.caption.startswith("A dog")
    assert len(e.abs_xy) == 3
    # dog center (25, 25)/100
    widx, x, y = e.abs_xy[0]
    assert e.words[widx].lower() == "dog"
    np.testing.assert_allclose((x, y), (0.25, 0.25))

    # feeds straight into the batch pipeline (abs targets populated)
    from diffusion_spacetime_attn_tpu.training.datasets import batches
    from diffusion_spacetime_attn_tpu.utils.tokenizer import make_roberta_tokenizer

    b = next(batches(ex, make_roberta_tokenizer(), 1, np.random.RandomState(0),
                     max_len=24, drop_last=False))
    assert b.abs_valid.sum() == 3
    assert b.rel_valid.sum() == 0


def test_vg_msdn_loader_and_train_step(tmp_path):
    """VG-MSDN scene-graph parsing (reference `loader/VGmsdnDataset.py`):
    triple sentence, hinge relations for spatial predicates, absolute (xc,yc)
    from GT boxes — then one train step on the resulting batch."""
    import json

    from diffusion_spacetime_attn_tpu.training.datasets import (
        example_to_arrays,
        load_vg_msdn_examples,
    )

    data = [
        {
            "id": 1, "path": "a.jpg", "width": 200, "height": 100,
            "objects": [
                {"class": "dog", "box": [0, 0, 100, 50]},
                {"class": "traffic light", "box": [100, 50, 200, 100]},
            ],
            "relationships": [
                {"sub_id": 0, "obj_id": 1, "predicate": "left of"},
                {"sub_id": 1, "obj_id": 0, "predicate": "wearing"},  # non-spatial
            ],
        },
        {"id": 2, "path": "b.jpg", "width": 10, "height": 10,
         "objects": [{"class": "cat", "box": [0, 0, 10, 10]}],
         "relationships": []},  # skipped (no relations)
    ]
    p = str(tmp_path / "vg.json")
    json.dump(data, open(p, "w"))

    exs = load_vg_msdn_examples(p)
    assert len(exs) == 1
    ex = exs[0]
    # triple sentence: "dog left of traffic light . traffic light wearing dog ."
    assert ex.words[0] == "dog" and "." in ex.words
    # one hinge relation (the spatial predicate only)
    assert len(ex.relations) == 1 and ex.relations[0][2] == "left of"
    # absolute targets: dog center (0.25, 0.25), light center (0.75, 0.75)
    xy = {ex.words[w]: (x, y) for w, x, y in ex.abs_xy}
    np.testing.assert_allclose(xy["dog"], (0.25, 0.25))
    np.testing.assert_allclose(xy["traffic"], (0.75, 0.75))

    tok = make_roberta_tokenizer()
    arr = example_to_arrays(ex, tok, max_len=32, max_rels=2, max_objs=4)
    assert arr["rel_valid"].sum() == 1.0 and arr["abs_valid"].sum() == 2.0

    model, params = create_layout_predictor(TINY, jax.random.PRNGKey(0))
    train_cfg = LayoutTrainConfig(batch_size=2, warmup_steps=2, hold_steps=2,
                                  decay_steps=100)
    trainer = LayoutTrainer.create(TINY, train_cfg, params)
    opt_state = trainer.init_state(params)
    for batch in batches([ex, ex], tok, 2, np.random.RandomState(0),
                         max_len=32, max_rels=2, max_objs=4, epochs=1):
        params, opt_state, loss, _ = trainer.train_step(params, opt_state, batch)
        assert np.isfinite(float(loss))


def test_layout_trainer_fsdp_matches_replicated():
    """LayoutTrainer fsdp=True: params + dual-LR optimizer state sharded
    over the data axis, numerics identical to the plain step."""
    from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=8)
    rng = np.random.RandomState(7)
    model, params = create_layout_predictor(TINY, jax.random.PRNGKey(0))
    tok = make_roberta_tokenizer()
    train_cfg = LayoutTrainConfig(batch_size=8, encoder_max_lr=1e-4,
                                  head_max_lr=3e-3, warmup_steps=5,
                                  hold_steps=5, decay_steps=10000)
    examples = synthetic_examples(16, rng)
    batch = next(batches(examples, tok, 8, np.random.RandomState(0),
                         max_len=16, max_rels=2, max_objs=2, epochs=1))

    plain = LayoutTrainer.create(TINY, train_cfg, params)
    p0, o0, loss0, _ = plain.train_step(params, plain.init_state(params), batch)

    tr = LayoutTrainer.create(TINY, train_cfg, params, mesh=mesh, fsdp=True)
    opt_state = tr.init_state(params)
    sharded = [l for l in jax.tree_util.tree_leaves(opt_state)
               if hasattr(l, "sharding") and "data" in str(l.sharding.spec)]
    assert sharded, "no optimizer leaf got FSDP-sharded"
    p1, o1, loss1, _ = tr.train_step(params, opt_state, batch)
    out_sharded = [l for l in jax.tree_util.tree_leaves(p1)
                   if hasattr(l, "sharding") and "data" in str(l.sharding.spec)]
    assert out_sharded, "params did not stay sharded across the step"

    np.testing.assert_allclose(float(loss1), float(loss0), rtol=2e-5)
    a = jax.tree_util.tree_leaves(p0)[0]
    b = jax.tree_util.tree_leaves(p1)[0]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


@pytest.mark.smoke
def test_attach_sampled_abs_targets_satisfies_relations(tmp_path):
    """The sampled-anchor substitute for the missing COCO absolute half
    (docs/LAYOUT_TRAINING.md): anchors come from the reference's own
    sta_dict.json statistics and the repair pass must order every related
    pair along the relation axis at >= the hinge margin, so the GMM-NLL
    and hinge terms never conflict."""
    import json

    from diffusion_spacetime_attn_tpu.training.datasets import (
        LayoutExample,
        attach_sampled_abs_targets,
    )

    sta = tmp_path / "sta_dict.json"
    sta.write_text(json.dumps({"x_mean": 0.5, "x_std": 0.2,
                               "y_mean": 0.5, "y_std": 0.2}))
    rng = np.random.RandomState(0)
    exs = []
    rels = ["above", "below", "left of", "right of"]
    for k in range(32):
        exs.append(LayoutExample(
            caption="t", words=["a", "b", "c"],
            object_word_idx=[0, 1, 2],
            relations=[[0, 1, rels[k % 4]], [1, 2, rels[(k + 1) % 4]]],
        ))
    out = attach_sampled_abs_targets(exs, str(sta), rng=rng, margin=0.2)
    assert len(out) == len(exs)
    for ex in out:
        xy = {w: (x, y) for w, x, y in ex.abs_xy}
        assert set(xy) == {0, 1, 2}
        for (x, y) in xy.values():
            assert 0.0 <= x <= 1.0 and 0.0 <= y <= 1.0
        for i, j, rel in ex.relations:
            axis = 1 if rel in ("above", "below") else 0
            d = xy[j][axis] - xy[i][axis]
            if rel in ("above", "left of"):
                assert d >= 0.2 - 1e-6, (rel, xy[i], xy[j])
            else:
                assert -d >= 0.2 - 1e-6, (rel, xy[i], xy[j])
    # deterministic given the rng seed
    out2 = attach_sampled_abs_targets(exs, str(sta),
                                      rng=np.random.RandomState(0))
    assert out[0].abs_xy == out2[0].abs_xy


@pytest.mark.smoke
def test_trained_run_dir_loading(tmp_path, monkeypatch):
    """scripts/train_layout.py's output layout (best.json + config.json +
    best_params orbax dir) loads through utils.loader: the stored config
    rebuilds the trained architecture even when the caller passes a
    different cfg, and find_default_layout_checkpoint honors
    DSTA_LAYOUT_CKPT."""
    import dataclasses as dc
    import json

    import orbax.checkpoint as ocp

    from diffusion_spacetime_attn_tpu.utils.loader import (
        find_default_layout_checkpoint,
        load_layout_predictor,
    )

    model, params = create_layout_predictor(TINY, jax.random.PRNGKey(1))
    ckdir = tmp_path / "run"
    ckdir.mkdir()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(str(ckdir / "best_params"),
                   jax.tree_util.tree_map(np.asarray, params))
    (ckdir / "best.json").write_text(json.dumps(
        {"step": 7, "epoch": 3, "val_loss": -1.0,
         "params_path": "best_params"}))
    (ckdir / "config.json").write_text(json.dumps(
        {"layout": dc.asdict(TINY), "train": {}}))

    monkeypatch.setenv("DSTA_LAYOUT_CKPT", str(ckdir))
    found = find_default_layout_checkpoint()
    assert found == str(ckdir)

    # pass a DIFFERENT cfg — loader must rebuild from the stored config
    other = dc.replace(TINY, layers=1, heads=1)
    model2, params2 = load_layout_predictor(other, found)
    la = jax.tree_util.tree_leaves(params)
    lb = jax.tree_util.tree_leaves(params2)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    monkeypatch.delenv("DSTA_LAYOUT_CKPT")
    monkeypatch.chdir(tmp_path)  # no repo saved/ dir in sight
    # (repo-level saved/layout_gpt3 may exist on the build box; only assert
    # the env override worked above)


def test_template_augmentation():
    """augment_with_templates: exact word indices (incl. duplicate object
    words), hinge-only supervision, deterministic, and every template's
    {a}/{b} slots resolve."""
    from diffusion_spacetime_attn_tpu.training.datasets import (
        REL_TEMPLATES,
        LayoutExample,
        augment_with_templates,
    )

    ex = LayoutExample(
        caption="the dog chased the dog around",
        words=["the", "dog", "chased", "the", "dog", "around"],
        object_word_idx=[1, 4],
        relations=[[1, 4, "left of"]],
    )
    out = augment_with_templates([ex], np.random.RandomState(0), variants=2)
    assert len(out) == 2
    for a in out:
        ia, ib = a.object_word_idx
        # duplicate object word: indices must point at the SLOT positions
        assert a.words[ia] == "dog" and a.words[ib] == "dog" and ia != ib
        assert a.relations == [[ia, ib, "left of"]]
        assert a.abs_xy is None  # hinge-only supervision
    # deterministic given the rng seed
    out2 = augment_with_templates([ex], np.random.RandomState(0), variants=2)
    assert [a.caption for a in out] == [a.caption for a in out2]
    # unknown relations are skipped, not crashed on
    bad = LayoutExample("x", ["x"], [0], [[0, 0, "inside"]])
    assert augment_with_templates([bad], np.random.RandomState(0)) == []
    for ts in REL_TEMPLATES.values():
        for t in ts:
            assert "{a}" in t.split() and "{b}" in t.split()


def test_transitive_closure_augmentation():
    """close_relations_transitively: infers chain-implied triples per axis,
    respects mixed canonical/inverse phrasings, caps at max_rels, skips
    contradictions, and leaves chain-free examples untouched (same
    object)."""
    from diffusion_spacetime_attn_tpu.training.datasets import (
        LayoutExample,
        close_relations_transitively,
    )

    # a left of b, b left of c  ⇒  a left of c
    ex = LayoutExample(
        caption="", words=["a", "b", "c"], object_word_idx=[0, 1, 2],
        relations=[[0, 1, "left of"], [1, 2, "left of"]],
    )
    (out,) = close_relations_transitively([ex])
    assert [0, 2, "left of"] in out.relations and len(out.relations) == 3

    # inverse phrasing chains too: a left of b + c right of b ⇒ a left of c
    ex2 = LayoutExample(
        caption="", words=["a", "b", "c"], object_word_idx=[0, 1, 2],
        relations=[[0, 1, "left of"], [2, 1, "right of"]],
    )
    (out2,) = close_relations_transitively([ex2])
    assert [0, 2, "left of"] in out2.relations

    # axes never mix: above+left of implies nothing
    ex3 = LayoutExample(
        caption="", words=["a", "b", "c"], object_word_idx=[0, 1, 2],
        relations=[[0, 1, "above"], [1, 2, "left of"]],
    )
    (out3,) = close_relations_transitively([ex3])
    assert out3 is ex3  # unchanged object, no copy

    # contradictory cycle (a<b<c<a): no inferred pair survives
    ex4 = LayoutExample(
        caption="", words=["a", "b", "c"], object_word_idx=[0, 1, 2],
        relations=[[0, 1, "left of"], [1, 2, "left of"], [2, 0, "left of"]],
    )
    (out4,) = close_relations_transitively([ex4])
    assert out4 is ex4

    # max_rels caps the appended triples
    chain = [[i, i + 1, "above"] for i in range(5)]  # closure adds 10 more
    ex5 = LayoutExample(
        caption="", words=list("abcdef"), object_word_idx=list(range(6)),
        relations=chain,
    )
    (out5,) = close_relations_transitively([ex5], max_rels=8)
    assert len(out5.relations) == 8
    assert out5.relations[:5] == chain  # originals kept, in order


def test_checkpoint_discovery_requires_params(tmp_path, monkeypatch):
    """Fresh-checkout shape: best.json is committed metadata but the orbax
    params dir is gitignored.  Discovery must NOT return a metadata-only
    dir (auto-default would crash every CLI at startup), and an EXPLICIT
    DSTA_LAYOUT_CKPT pointing at one must raise rather than silently
    substituting another checkpoint."""
    import json

    from diffusion_spacetime_attn_tpu.utils.loader import (
        _is_loadable_run_dir,
        find_default_layout_checkpoint,
    )

    ckdir = tmp_path / "metadata_only"
    ckdir.mkdir()
    (ckdir / "best.json").write_text(json.dumps(
        {"step": 7, "epoch": 3, "params_path": "best_params"}))
    assert not _is_loadable_run_dir(str(ckdir))

    monkeypatch.setenv("DSTA_LAYOUT_CKPT", str(ckdir))
    with pytest.raises(FileNotFoundError):
        find_default_layout_checkpoint()

    # a loadable dir only needs the params path to exist
    (ckdir / "best_params").mkdir()
    assert _is_loadable_run_dir(str(ckdir))
    assert find_default_layout_checkpoint() == str(ckdir)
