import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.eval.metrics import (
    Detection,
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
