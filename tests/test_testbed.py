"""Closed-loop semantic testbed: scenes, oracle detector, eval-loop smoke.

The testbed (diffusion_spacetime_attn_tpu/testbed/) is the in-environment
stand-in for the reference's generate->detect->score evidence chain
(`plms.py:249-273` scored by `evaluation/detector_result_gpt.py:164-166`):
tiny trained models + a weights-independent oracle detector.  These tests
pin the parts the METHOD_EVAL artifact's validity rests on:

  * the oracle detector is near-perfect on clean rendered scenes (so its
    numbers measure the generator, not the detector);
  * training captions carry no positional information and held-out pairs
    never co-occur (so any relation-accuracy gain is the method's);
  * the GT layout geometry satisfies the protocol's own relation_pass rule;
  * the full vanilla-vs-method loop of scripts/method_eval_testbed.py runs
    end-to-end at smoke shapes (smoke_pipeline_cfg).
"""
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.eval import metrics
from diffusion_spacetime_attn_tpu.testbed import data as tbdata
from diffusion_spacetime_attn_tpu.testbed import oracle, scenes
from diffusion_spacetime_attn_tpu.testbed.configs import smoke_pipeline_cfg


# ----------------------------------------------------------------------
# oracle detector calibration (clean rendered scenes)
# ----------------------------------------------------------------------

def test_oracle_near_perfect_on_clean_scenes():
    chk = oracle.oracle_self_check(n=40, seed=0)
    assert chk["recall"] >= 0.97, chk
    assert chk["precision"] >= 0.97, chk


def test_oracle_identifies_every_category():
    # one centered object per category, at a small and a large size
    for cat in scenes.CATEGORIES:
        color, shape = cat.split()
        for size in (0.2, 0.4):
            img = scenes.render_scene(
                [scenes.SceneObject(color, shape, 0.5, 0.5, size)])
            dets = [d for d in oracle.detect(img) if d.score >= 0.4]
            assert [d.category for d in dets] == [cat], (cat, size, dets)


def test_oracle_two_objects_boxes_localized():
    a = scenes.SceneObject("red", "square", 0.25, 0.5, 0.25)
    b = scenes.SceneObject("blue", "circle", 0.75, 0.5, 0.25)
    dets = {d.category: d.box for d in oracle.detect(scenes.render_scene([a, b]))}
    assert set(dets) == {"red square", "blue circle"}
    rx = (dets["red square"][0] + dets["red square"][2]) / 2
    bx = (dets["blue circle"][0] + dets["blue circle"][2]) / 2
    assert rx < 32 < bx  # centers on the correct halves of the 64-px canvas


# ----------------------------------------------------------------------
# dataset invariants the METHOD_EVAL artifact's causality claim rests on
# ----------------------------------------------------------------------

def test_heldout_pairs_never_cooccur_in_training():
    excluded = set(scenes.heldout_pairs(20))
    rng = np.random.RandomState(11)
    for _ in range(300):
        _, _, objs = scenes.sample_training_scene(rng, canvas=16,
                                                  excluded_pairs=excluded)
        if len(objs) == 2:
            a, b = objs[0].category, objs[1].category
            assert (a, b) not in excluded and (b, a) not in excluded


def test_training_caption_relation_is_uninformative():
    """The caption's relation word is drawn independently of the layout:
    it should agree with the truthful relation ~25% of the time (4 words)."""
    rng = np.random.RandomState(5)
    agree = total = 0
    while total < 300:
        _, cap, objs = scenes.sample_training_scene(rng, canvas=16)
        if len(objs) != 2:
            continue
        rel_words = [r for r in scenes.RELATIONS if f" {r} " in cap]
        assert len(rel_words) == 1, cap
        agree += rel_words[0] == tbdata.truthful_relation(*objs)
        total += 1
    assert 0.10 <= agree / total <= 0.45, agree / total


def test_eval_prompts_deterministic_with_both_splits():
    p1 = scenes.make_eval_prompts(100, seed=777)
    p2 = scenes.make_eval_prompts(100, seed=777)
    assert [p.caption for p in p1] == [p.caption for p in p2]
    held = [p for p in p1 if p.held_out]
    assert 10 <= len(held) <= 40  # ~25% by construction
    excluded = set(scenes.heldout_pairs(20))
    for p in p1:
        assert ((p.cat_a, p.cat_b) in excluded) == p.held_out


def test_tokenizer_eot_is_argmax_token():
    # CLIPTextTower pools the argmax token id (models/clip.py) — the
    # testbed vocabulary must keep EOT as the highest id
    ids = scenes.tokenize("a red circle above a blue square")
    assert ids.max() == scenes.EOT_ID
    assert int(np.sum(ids == scenes.EOT_ID)) == 1


def test_gt_layout_satisfies_protocol_relation_rule():
    """relation_layout centers must pass eval.metrics' own center-geometry
    rule (`relation_result_gpt.py:95-110` semantics) for every relation."""
    for rel in scenes.RELATIONS:
        (ax, ay), (bx, by) = scenes.relation_layout(rel)
        dets = [
            metrics.Detection(box=(64 * ax - 8, 64 * ay - 8,
                                   64 * ax + 8, 64 * ay + 8),
                              category="red circle", score=0.9),
            metrics.Detection(box=(64 * bx - 8, 64 * by - 8,
                                   64 * bx + 8, 64 * by + 8),
                              category="blue square", score=0.9),
        ]
        _, _, acc = metrics.relation_accuracy(
            [dets], [[("red circle", "blue square", rel)]])
        assert acc == 1.0, rel


def test_truthful_relation_matches_relation_pass():
    rng = np.random.RandomState(3)
    for _ in range(50):
        a = scenes._sample_object(rng, size_range=(0.15, 0.3))
        b = scenes._sample_object(rng, size_range=(0.15, 0.3))
        rel = tbdata.truthful_relation(a, b)
        dets = [metrics.Detection((64 * (o.cx - 0.05), 64 * (o.cy - 0.05),
                                   64 * (o.cx + 0.05), 64 * (o.cy + 0.05)),
                                  o.category, 0.9) for o in (a, b)]
        if a.category == b.category:
            continue
        _, _, acc = metrics.relation_accuracy(
            [dets], [[(a.category, b.category, rel)]])
        assert acc == 1.0, (rel, a, b)


def test_dataset_builder_deterministic_and_aligned():
    d1 = tbdata.build_dataset(n_scenes=24, seed=9, canvas=32, clip_size=14)
    d2 = tbdata.build_dataset(n_scenes=24, seed=9, canvas=32, clip_size=14)
    for k in d1:
        np.testing.assert_array_equal(d1[k], d2[k])
    assert d1["images"].dtype == np.uint8
    assert d1["images"].shape == (24, 32, 32, 3)
    assert d1["ldm_tokens"].shape == (24, scenes.MAX_LEN)
    assert d1["clip_images"].shape[1:] == (14, 14, 3)
    assert len(d1["clip_images"]) == len(d1["clip_tokens"])


# ----------------------------------------------------------------------
# smoke miniature of the METHOD_EVAL loop (generate -> detect -> score)
# ----------------------------------------------------------------------

def test_method_eval_loop_smoke():
    """The exact loop of scripts/method_eval_testbed.py at smoke shapes:
    paired-noise vanilla vs spacetime-optimized generation, oracle-scored
    through the standard protocol math.  Random weights — asserts the
    plumbing (shapes, finiteness, pairing), not semantics."""
    from diffusion_spacetime_attn_tpu.models.clip import CLIP
    from diffusion_spacetime_attn_tpu.pipeline.losses import DCLIPLoss
    from diffusion_spacetime_attn_tpu.pipeline.pipeline import StableDiffusion
    from diffusion_spacetime_attn_tpu.pipeline.spacetime import (
        SpaceTimeInputs,
        optimize_prompt,
    )
    from diffusion_spacetime_attn_tpu.utils.testing import randomize_params

    cfg = smoke_pipeline_cfg(num_steps=4)
    st = dc.replace(cfg.spacetime, epochs=1)
    sd = StableDiffusion.create(cfg, jax.random.PRNGKey(0))
    sd = dc.replace(
        sd,
        unet_params=randomize_params(sd.unet_params, jax.random.PRNGKey(1),
                                     scale=0.1),
        vae_params=randomize_params(sd.vae_params, jax.random.PRNGKey(2),
                                    scale=0.1),
    )
    clip = CLIP(cfg.loss_clip)
    clip_params = clip.init(
        jax.random.PRNGKey(4),
        jnp.zeros((1, 14, 14, 3)),
        jnp.zeros((1, scenes.MAX_LEN), jnp.int32))["params"]
    clip_loss = DCLIPLoss(clip, clip_params, normalize=False)

    prompts = scenes.make_eval_prompts(2, seed=777)
    L = st.latent_size

    def encode(caps):
        ids = jnp.asarray(np.stack([scenes.tokenize(c) for c in caps]))
        return sd.encode_text(ids)

    cond = encode([p.caption for p in prompts])
    uncond = jnp.broadcast_to(encode([""]), cond.shape)
    x_T = jax.random.normal(jax.random.PRNGKey(7), (2, L, L, 4))
    inputs = SpaceTimeInputs(
        cond=cond, uncond=uncond,
        local_contexts=jnp.stack([
            encode([f"a photo of a {p.cat_a}", f"a photo of a {p.cat_b}"])
            for p in prompts]),
        centers=jnp.asarray([p.centers for p in prompts], jnp.float32),
        active=jnp.ones((2, 2), jnp.float32),
        caption_tokens=jnp.asarray(
            np.stack([scenes.tokenize(p.caption) for p in prompts])),
        object_tokens=jnp.asarray(np.stack([
            np.stack([scenes.tokenize(f"a photo of a {p.cat_a}"),
                      scenes.tokenize(f"a photo of a {p.cat_b}")])
            for p in prompts])),
        x_T=x_T,
    )

    # vanilla arm (same noise)
    eps = sd.make_eps_fn(cond, uncond, st.guidance_scale)
    v_imgs = sd.decode_latents(sd.sample_from(eps, x_T, sampler="plms"))
    # method arm
    m_imgs, coef, losses = optimize_prompt(sd, clip_loss, inputs, st)

    assert v_imgs.shape == m_imgs.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(v_imgs)).all()
    assert np.isfinite(np.asarray(m_imgs)).all()
    assert np.isfinite(np.asarray(losses)).all()

    # score both arms through the oracle + protocol math (images are noise
    # at random weights — only the plumbing contract is asserted)
    for imgs in (v_imgs, m_imgs):
        rows = []
        for im, p in zip(np.asarray(imgs), prompts):
            dets = oracle.detect(im)
            _, _, rec = metrics.object_recall([dets], [[p.cat_a, p.cat_b]])
            _, _, rel = metrics.relation_accuracy(
                [dets], [[(p.cat_a, p.cat_b, p.rel)]])
            rows.append((rec, rel))
        assert all(0.0 <= r <= 1.0 and 0.0 <= q <= 1.0 for r, q in rows)
