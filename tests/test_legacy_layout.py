"""Legacy layout family (Rel2Layout / Rel2RegLayout + greedy/beam decode).

Reference: `model/Model.py:937-1016`, `model/Decoder.py:211-306`,
`model/Inference.py` — dead code there (unreachable from build_model);
behavior contracts tested here: teacher-forced shapes, decoder causality,
greedy scan == step-by-step argmax, beam(K=1) == greedy, EOS handling.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.models.layout.legacy import (
    BOS,
    EOS,
    LegacyConfig,
    Rel2Layout,
    Rel2RegLayout,
    beam_decode,
    greedy_decode,
    greedy_decode_reg,
)

CFG = LegacyConfig(vocab_size=30, obj_id_size=10, cls_size=12, pos_size=8,
                   shape_size=8, hidden=32, layers=2, heads=2, max_out_len=6)
B, L = 2, 9


def _src(rng):
    return (
        jnp.asarray(rng.randint(4, 30, (B, L)), jnp.int32),       # tokens
        jnp.asarray(rng.randint(0, 10, (B, L)), jnp.int32),       # obj ids
        jnp.asarray(rng.randint(0, 5, (B, L)), jnp.int32),        # segments
        jnp.asarray(rng.randint(0, 4, (B, L)), jnp.int32),        # token types
        jnp.asarray(rng.rand(B, L) > 0.2, jnp.float32),           # pad mask
    )


@pytest.fixture(scope="module")
def discrete():
    rng = np.random.RandomState(0)
    src = _src(rng)
    T = 5
    trg = tuple(
        jnp.asarray(rng.randint(0, n, (B, T)), jnp.int32)
        for n in (CFG.cls_size, CFG.pos_size, CFG.shape_size)
    )
    model = Rel2Layout(CFG)
    params = model.init(jax.random.PRNGKey(0), *src, *trg)["params"]
    return model, params, src, trg


def test_rel2layout_shapes(discrete):
    model, params, src, trg = discrete
    lc, lp, ls = model.apply({"params": params}, *src, *trg)
    assert lc.shape == (B, 5, CFG.cls_size)
    assert lp.shape == (B, 5, CFG.pos_size)
    assert ls.shape == (B, 5, CFG.shape_size)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in (lc, lp, ls))


def test_decoder_is_causal(discrete):
    """Changing target position t must not change logits at positions < t."""
    model, params, src, trg = discrete
    lc0, _, _ = model.apply({"params": params}, *src, *trg)
    cls2 = trg[0].at[:, 3].set((trg[0][:, 3] + 1) % CFG.cls_size)
    lc1, _, _ = model.apply({"params": params}, *src, cls2, trg[1], trg[2])
    np.testing.assert_allclose(np.asarray(lc0[:, :3]), np.asarray(lc1[:, :3]),
                               atol=1e-5)
    assert np.abs(np.asarray(lc0[:, 3:]) - np.asarray(lc1[:, 3:])).max() > 1e-6


def test_greedy_matches_manual_first_step(discrete):
    model, params, src, _ = discrete
    cls_o, pos_o, shp_o, valid = jax.jit(
        lambda p: greedy_decode(model, p, *src))(params)
    assert cls_o.shape == (B, CFG.max_out_len)
    # manual step 0: decode from an all-BOS prefix
    memory = model.apply({"params": params}, *src, method=Rel2Layout.encode)
    T = CFG.max_out_len
    bos = jnp.full((B, T + 1), BOS, jnp.int32)
    lc, lp, ls = model.apply({"params": params}, bos, bos, bos, memory,
                             src[4], method=Rel2Layout.decode)
    np.testing.assert_array_equal(np.asarray(cls_o[:, 0]),
                                  np.asarray(jnp.argmax(lc[:, 0], -1)))
    np.testing.assert_array_equal(np.asarray(pos_o[:, 0]),
                                  np.asarray(jnp.argmax(lp[:, 0], -1)))
    # validity mask: monotone non-increasing after first EOS
    v = np.asarray(valid)
    assert v.dtype == bool and v.shape == (B, T)
    for b in range(B):
        if (np.asarray(cls_o[b]) == EOS).any():
            first = int(np.argmax(np.asarray(cls_o[b]) == EOS))
            assert v[b, : first + 1].all() and not v[b, first + 1:].any()


def test_beam_width1_equals_greedy(discrete):
    model, params, src, _ = discrete
    cls_g, _, _, _ = greedy_decode(model, params, *src)
    cls_b, _, _, scores = beam_decode(model, params, *src, beam=1)
    np.testing.assert_array_equal(np.asarray(cls_b[:, 0]), np.asarray(cls_g))
    cls_b4, _, _, scores4 = beam_decode(model, params, *src, beam=4)
    # wider beam can only improve (or match) the best score
    assert np.all(np.asarray(scores4[:, 0]) >= np.asarray(scores[:, 0]) - 1e-4)


def test_rel2reglayout_and_greedy_reg():
    rng = np.random.RandomState(1)
    src = _src(rng)
    T = 5
    cls_tok = jnp.asarray(rng.randint(0, CFG.cls_size, (B, T)), jnp.int32)
    boxes = jnp.asarray(rng.rand(B, T, 4), jnp.float32)
    model = Rel2RegLayout(CFG)
    params = model.init(jax.random.PRNGKey(0), *src, cls_tok, boxes)["params"]
    lc, bx = model.apply({"params": params}, *src, cls_tok, boxes)
    assert lc.shape == (B, T, CFG.cls_size) and bx.shape == (B, T, 4)
    assert float(bx.min()) >= 0.0 and float(bx.max()) <= 1.0  # sigmoid head
    cls_o, box_o = jax.jit(lambda p: greedy_decode_reg(model, p, *src))(params)
    assert cls_o.shape == (B, CFG.max_out_len)
    assert box_o.shape == (B, CFG.max_out_len, 4)
    assert float(box_o.min()) >= 0.0 and float(box_o.max()) <= 1.0


def test_text2layout_forward_and_greedy():
    from diffusion_spacetime_attn_tpu.models.layout.legacy import (
        Text2Layout, greedy_decode,
    )

    rng = np.random.RandomState(2)
    model = Text2Layout(CFG, max_seq_len=L)
    tokens = jnp.asarray(rng.randint(4, 30, (B, L)), jnp.int32)
    pad = jnp.asarray(rng.rand(B, L) > 0.2, jnp.float32)
    T = 5
    trg = tuple(
        jnp.asarray(rng.randint(0, n, (B, T)), jnp.int32)
        for n in (CFG.cls_size, CFG.pos_size, CFG.shape_size)
    )
    params = model.init(jax.random.PRNGKey(0), tokens, pad, *trg)["params"]
    lc, lp, ls = model.apply({"params": params}, tokens, pad, *trg)
    assert lc.shape == (B, T, CFG.cls_size)
    # greedy reuse through the shared encode/decode surface
    zeros = jnp.zeros_like(tokens)
    cls_o, pos_o, shp_o, valid = greedy_decode(
        model, params, tokens, zeros, zeros, zeros, pad)
    assert cls_o.shape == (B, CFG.max_out_len)
    assert bool(jnp.all(cls_o >= 0))


def test_legacy_masked_pretraining_data(tmp_path):
    """VGDataset.random_word semantics (`loader/VGDataset.py:63-103`):
    masking statistics, ignore sentinels, segment/token_type construction;
    then one masked-LM-style loss step through the legacy RelEncoder heads."""
    import pickle
    import random as pyrandom

    from diffusion_spacetime_attn_tpu.models.layout.legacy import RelEncoder
    from diffusion_spacetime_attn_tpu.training.legacy_data import (
        MASK, SEP, legacy_pretrain_batches, load_legacy_rel_pickle,
        mask_relation_sentence,
    )

    r = np.random.RandomState(0)
    n, Ls = 8, 13
    # sentences: CLS trio SEP trio SEP ... with pad tail
    sents, ids, boxes = [], [], []
    for _ in range(n):
        s = [1] + [int(r.randint(4, 20)) for _ in range(3)] + [2] \
            + [int(r.randint(4, 20)) for _ in range(3)] + [2]
        s += [0] * (Ls - len(s))
        sents.append(np.array(s))
        ids.append(r.randint(0, 5, Ls))
        boxes.append(r.rand(Ls, 4).astype(np.float32))
    p = tmp_path / "rel.pkl"
    pickle.dump({"rel": sents, "id": ids, "rel_box": boxes}, open(p, "wb"))
    s2, i2, b2 = load_legacy_rel_pickle(str(p))
    assert len(s2) == n

    tok, oid, lab, seg, tt, blab = mask_relation_sentence(
        sents[0], ids[0], boxes[0], pyrandom.Random(0))
    # pad positions: zero everywhere, sentinel boxes
    pad = sents[0] == 0
    assert (lab[pad] == 0).all() and (seg[pad] == 0).all()
    np.testing.assert_allclose(blab[pad], 2.0)
    # masked positions carry the original token as label
    masked = tok == MASK
    assert (lab[masked] == sents[0][masked]).all()
    # unmasked-unlabeled positions keep the original token
    keep = (lab == 0)
    np.testing.assert_array_equal(tok[keep], sents[0][keep])
    # segment increments after each SEP
    sep_pos = np.where(sents[0] == SEP)[0]
    assert seg[sep_pos[0]] == 1 and seg[sep_pos[1]] == 2

    # drive one masked-prediction loss through the legacy encoder heads
    (btok, boid, blab_, bseg, btt, bbox) = next(
        legacy_pretrain_batches(sents, ids, boxes, batch_size=4, seed=1))
    enc = RelEncoder(CFG)
    pad_mask = jnp.asarray(btok > 0, jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(btok),
                      jnp.asarray(boid % CFG.obj_id_size),
                      jnp.asarray(bseg % CFG.max_rel_pair),
                      jnp.asarray(btt), pad_mask)["params"]
    _, vocab_logits, _, _ = enc.apply(
        {"params": params}, jnp.asarray(btok % CFG.vocab_size),
        jnp.asarray(boid % CFG.obj_id_size),
        jnp.asarray(bseg % CFG.max_rel_pair), jnp.asarray(btt), pad_mask)
    mask_w = jnp.asarray(blab_ > 0, jnp.float32)
    logp = jax.nn.log_softmax(vocab_logits, -1)
    nll = -jnp.sum(
        jnp.take_along_axis(
            logp, jnp.asarray(blab_ % CFG.vocab_size)[..., None], -1
        )[..., 0] * mask_w
    ) / jnp.maximum(jnp.sum(mask_w), 1.0)
    assert np.isfinite(float(nll)) and float(nll) > 0.0
