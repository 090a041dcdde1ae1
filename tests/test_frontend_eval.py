import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.eval.metrics import (
    Detection,
    head_category,
    layout_relation_consistency,
    object_recall,
    parse_gpt_ground_truth,
    relation_accuracy,
    relation_pass,
    result_index,
)
from diffusion_spacetime_attn_tpu.pipeline.frontend import (
    extract_objects,
    local_prompt,
)
from diffusion_spacetime_attn_tpu.pipeline.runners import (
    parse_gpt_prompts,
    parse_line_prompts,
)

GPT_TXT = "/root/reference/datasets/gpt.txt"


def test_readme_golden_sentence():
    """README.md:54-64 golden: two objects found, bed and couch."""
    words, mentions = extract_objects(
        "The silver bed was situated to the right of the white couch."
    )
    cats = [m.category for m in mentions]
    assert cats == ["bed", "couch"]
    assert "bed" in mentions[0].phrase.lower()
    assert local_prompt(mentions[1]).startswith("A photo of ")
    # head-word indices point at the category nouns
    assert words[mentions[0].word_index].lower() == "bed"
    assert words[mentions[1].word_index].lower() == "couch"


def test_multiword_and_plural_categories():
    _, m = extract_objects("A wine glass next to two dogs near a traffic light.")
    cats = sorted(x.category for x in m)
    assert cats == ["dog", "traffic light", "wine glass"]


def test_category_aliases():
    """Synonyms the reference collects via WordNet (inference_coco.py:441-470)
    resolve to the canonical COCO category; gpt GT uses 'tv' while its
    captions say 'television'."""
    _, m = extract_objects("The red television sat beside a sofa and a bike.")
    cats = sorted(x.category for x in m)
    assert cats == ["bicycle", "couch", "tv"]
    assert "television" in m[0].phrase.lower()
    assert head_category("the red television") == "tv"
    # mscoco pkl GT names outside COCO stay as-is (un-extractable)
    from diffusion_spacetime_attn_tpu.pipeline.frontend import (
        canonical_category,
    )
    assert canonical_category("Bike") == "bicycle"
    assert canonical_category("bathroom") == "bathroom"


def test_relation_pass_matches_reference():
    # object1 center (5, 5), object2 center (10, 2)
    b1, b2 = (0, 0, 10, 10), (8, 0, 12, 4)
    assert relation_pass("below", b1, b2)       # y1=5 > y2=2
    assert relation_pass("left of", b1, b2)     # x1=5 < x2=10
    assert not relation_pass("right of", b1, b2)
    assert not relation_pass("above", b1, b2)


def test_object_recall_protocol():
    dets = [
        [Detection((0, 0, 1, 1), "dog", 0.9), Detection((0, 0, 1, 1), "cat", 0.3)],
        [Detection((0, 0, 1, 1), "car", 0.5)],
    ]
    gts = [["dog", "cat"], ["car", "bus"]]
    corr, cnt, rec = object_recall(dets, gts, conf=0.4)
    assert (corr, cnt) == (2, 4)  # cat below conf, bus missing
    assert rec == 0.5


def test_relation_accuracy_protocol():
    dets = [[
        Detection((0, 0, 4, 4), "dog", 0.9),   # center (2,2)
        Detection((6, 0, 10, 4), "cat", 0.8),  # center (8,2)
    ]]
    rels = [[("dog", "cat", "left of")]]
    corr, cnt, acc = relation_accuracy(dets, rels)
    assert (corr, cnt, acc) == (1, 1, 1.0)
    rels = [[("dog", "cat", "right of")]]
    assert relation_accuracy(dets, rels)[0] == 0


def test_layout_relation_consistency_metric():
    """Predicted-layout consistency: evaluated/satisfied/coverage counting."""
    preds = [
        {"dog": (0.2, 0.5), "cat": (0.8, 0.5)},  # dog left of cat: satisfied
        {"dog": (0.9, 0.5), "cat": (0.1, 0.5)},  # dog left of cat: violated
        {"dog": (0.5, 0.5)},                     # cat missing: not evaluated
        None,                                    # frontend found nothing
    ]
    rels = [[("dog", "cat", "left of")]] * 4
    s = layout_relation_consistency(preds, rels)
    assert s["relations_total"] == 4
    assert s["relations_evaluated"] == 2
    assert s["relations_satisfied"] == 1
    assert s["consistency_evaluated"] == 0.5
    assert s["consistency_total"] == 0.25
    # coverage: 8 object slots, covered = 2+2+1+0 = 5
    assert s["relation_object_coverage"] == 5 / 8


def test_result_file_listing_range_and_stale_guard(tmp_path):
    """Outdirs are resumable/reused: the scorer must honor prompt_range and
    raise (not mis-index) on stale images beyond the GT size."""
    from PIL import Image

    from diffusion_spacetime_attn_tpu.eval import protocol

    (tmp_path / "gpt.txt").write_text(
        "Objects: dog, cat\nRelation: dog left of cat\n"
        "Sentence: a dog left of a cat\n\n")
    for i in (0, 1, 7):  # index 7 = stale leftover from a longer run
        Image.new("RGB", (8, 8)).save(tmp_path / f"final2_s1_index_{i}.png")
    files = protocol.list_result_files(str(tmp_path), prompt_range=(0, 2))
    assert files == ["final2_s1_index_0.png", "final2_s1_index_1.png"]
    # unranged scoring over the dir sees index 7 > GT size 1 and must raise
    with pytest.raises(ValueError, match="stale"):
        protocol.score_results(str(tmp_path), "gpt", str(tmp_path), {})
    # ranged scoring is clean
    s = protocol.score_results(
        str(tmp_path), "gpt", str(tmp_path), {}, prompt_range=(0, 1))
    assert s["n_images"] == 1


def test_head_category():
    assert head_category("the silver bed") == "bed"
    assert head_category("a stop sign on the corner") == "stop sign"
    assert head_category("quux") is None


def test_result_index_naming():
    assert result_index("final2_s1_index_42.png") == 42
    assert result_index("final2_s1_other.png") is None


@pytest.mark.skipif(
    not __import__("os").path.exists(GPT_TXT), reason="reference datasets absent"
)
def test_parse_reference_datasets():
    prompts = parse_gpt_prompts(GPT_TXT)
    assert len(prompts) == 500
    assert prompts[0].startswith("The silver bed")
    objects, relations = parse_gpt_ground_truth(GPT_TXT)
    assert objects[0] == ["couch", "bed"]
    assert relations[0] == [("couch", "bed", "left of")]
    ms = parse_line_prompts("/root/reference/datasets/mscoco.txt")
    assert len(ms) == 500
    vsr = parse_line_prompts("/root/reference/datasets/vsr.txt")
    assert len(vsr) == 500


def test_clip_detector_mechanism():
    """CLIP sliding-window detector: shapes/protocol (random weights)."""
    import jax
    import jax.numpy as jnp

    from diffusion_spacetime_attn_tpu.config import (
        CLIPConfig,
        CLIPTextConfig,
        CLIPVisionConfig,
    )
    from diffusion_spacetime_attn_tpu.eval.clip_detector import CLIPDetector
    from diffusion_spacetime_attn_tpu.models.clip import CLIP
    from diffusion_spacetime_attn_tpu.utils.testing import randomize_params
    from diffusion_spacetime_attn_tpu.utils.tokenizer import make_clip_tokenizer

    cfg = CLIPConfig(
        vision=CLIPVisionConfig(image_size=32, patch_size=16, width=16,
                                layers=1, heads=2, projection_dim=8),
        text=CLIPTextConfig(width=16, layers=1, heads=2, vocab_size=49408, max_len=12),
        projection_dim=8,
    )
    clip = CLIP(cfg)
    params = randomize_params(
        clip.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                  jnp.zeros((1, 12), jnp.int32))["params"],
        jax.random.PRNGKey(1), 0.1,
    )
    tok = make_clip_tokenizer(max_len=12)
    det = CLIPDetector(
        clip, params, lambda t: tok.pad_to(tok.encode(t), 12),
        categories=["dog", "cat", "car"], scales=(1.0, 0.5),
    )
    img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    dets = det(img)
    assert len(dets) == 3  # one top box per category
    for d in dets:
        assert d.category in ("dog", "cat", "car")
        assert 0.0 <= d.score <= 1.0
        x1, y1, x2, y2 = d.box
        assert 0 <= x1 < x2 <= 64 and 0 <= y1 < y2 <= 64


def test_optimizer_skips_nonfinite():
    import jax
    import jax.numpy as jnp

    from diffusion_spacetime_attn_tpu.config import LayoutConfig, LayoutTrainConfig
    from diffusion_spacetime_attn_tpu.models.layout.model import create_layout_predictor
    from diffusion_spacetime_attn_tpu.training.layout_trainer import make_optimizer

    cfg = LayoutConfig(vocab_size=100, hidden=32, layers=1, heads=2,
                       ffn_dim=64, max_positions=40, max_len=8)
    _, params = create_layout_predictor(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer(LayoutTrainConfig(), params)
    state = opt.init(params)
    bad_grads = jax.tree_util.tree_map(lambda x: jnp.full_like(x, jnp.nan), params)
    updates, state = opt.update(bad_grads, state, params)
    # non-finite step is entirely skipped: all updates are zero
    assert all(
        np.asarray(u == 0).all() for u in jax.tree_util.tree_leaves(updates)
    )


def test_extract_relations_constructions():
    """Surface-relation extraction across the corpus's phrasing families
    (gap cues, possessive clauses, pronoun objects, conjunction lists,
    between-constructions, transitive closure)."""
    from diffusion_spacetime_attn_tpu.pipeline.frontend import (
        extract_relations,
    )

    def rels(s):
        w, m = extract_objects(s)
        return set(extract_relations(w, m))

    # 1. gap cue between adjacent mentions
    assert ("cat", "dog", "above") in rels("The cat is above the dog.")
    assert ("bowl", "toilet", "below") in rels(
        "The bowl was placed underneath the toilet.")
    # 2. verb+on support cue binds tightly: next NP only
    assert ("book", "bed", "above") in rels("The book was placed on the bed.")
    assert ("person", "bowl", "above") not in rels(
        "The person was lying on the ground, with the black bowl nearby.")
    # 3. subordinate possessive: located = clause NP, possessor = subject
    assert ("horse", "giraffe", "right of") in rels(
        "The giraffe stood tall, with the horse grazing to its right.")
    # 4. subject motion: possessor = nearest mention
    assert ("bird", "elephant", "left of") in rels(
        "The bird flew away from the elephant to its left.")
    # 5. person pronoun possessor
    assert ("bowl", "person", "left of") in rels(
        "The person stood there, with the bowl positioned to their left.")
    # 6. vertical + pronoun object ("above it" → previous clause's object)
    assert ("knife", "bowl", "above") in rels(
        "The bowl was placed on the counter, with the knife resting above it.")
    # 7. "left of it" pronoun object
    assert ("umbrella", "suitcase", "left of") in rels(
        "The handbag is right of the suitcase, with a red umbrella "
        "placed to the left of it.")
    # 8. at their feet
    assert ("mouse", "person", "below") in rels(
        "The person sat at the desk, with the red mouse at their feet.")
    # 9. conjunction extension across a coordinated NP list
    r = rels("The cat is positioned beneath both the dog and the horse.")
    assert ("cat", "dog", "below") in r and ("cat", "horse", "below") in r
    # 10. between-construction: sides are relative to the subject
    r = rels("A blue boat was parked between a car to its right and a "
             "bicycle to its left.")
    assert ("car", "boat", "right of") in r
    assert ("bicycle", "boat", "left of") in r
    # 11. transitive closure per axis
    r = rels("The cup is left of the fork and the fork is left of the bowl.")
    assert ("cup", "bowl", "left of") in r
    # 12. hands are deliberately not extracted (corpus mirrors ~50/50)
    assert not rels("The person held the remote in their right hand.")
    # 13. no relations → empty, never crashes
    assert rels("A cat and a dog.") == set()


def test_relation_aware_decode_picks_satisfying_components():
    """The relation-aware GMM decode chooses per-object components that
    jointly satisfy extracted relations, and falls back to exactly the
    greedy argmax-component mean when no relations are found."""
    import jax

    from diffusion_spacetime_attn_tpu.config import LayoutConfig
    from diffusion_spacetime_attn_tpu.models.layout.model import (
        create_layout_predictor,
    )
    from diffusion_spacetime_attn_tpu.pipeline.frontend import (
        LayoutInference,
    )
    from diffusion_spacetime_attn_tpu.utils.tokenizer import (
        make_roberta_tokenizer,
    )

    cfg = LayoutConfig(layers=1, heads=2)
    model, params = create_layout_predictor(cfg, jax.random.PRNGKey(3))
    tok = make_roberta_tokenizer(None, None)

    rel_infer = LayoutInference(model, params, tok, relation_aware=True)
    greedy = LayoutInference(model, params, tok, relation_aware=False)

    # no relations in the sentence → identical to greedy decode
    s0 = "A cat and a dog."
    assert rel_infer(s0) == greedy(s0)

    # with a relation: if ANY component pair satisfies it, the decode must
    sent = "The cat is to the left of the dog."
    res = rel_infer(sent)
    cat = next(v for k, v in res.items() if "cat" in k)
    dog = next(v for k, v in res.items() if "dog" in k)
    # the chosen centers must be means of the model's own components
    import numpy as np

    from diffusion_spacetime_attn_tpu.models.layout.gmm_head import split_gmm

    words, mentions = __import__(
        "diffusion_spacetime_attn_tpu.pipeline.frontend",
        fromlist=["extract_objects"]).extract_objects(sent)
    ids, align = tok.encode_with_alignment(words)
    tokens = np.asarray(tok.pad_to(ids, rel_infer.max_len), np.int32)[None]
    opos = np.zeros((1, rel_infer.max_len), np.float32)
    tidx = [align[m.word_index] for m in mentions]
    for t in tidx:
        opos[0, t] = 1.0
    import jax.numpy as jnp

    _, raw = rel_infer._jit_forward(
        rel_infer.params, jnp.array(tokens), jnp.array(opos))
    p = split_gmm(np.asarray(raw)[0][np.asarray(tidx)])
    mx = np.asarray(p.mu_x)
    satisfiable = (mx[0][:, None] < mx[1][None, :]).any()
    if satisfiable:
        assert cat[0] < dog[0], "decode left a satisfiable relation unmet"
    for n, c in ((0, cat), (1, dog)):
        assert any(abs(float(mx[n, k]) - c[0]) < 1e-6 for k in range(5))
