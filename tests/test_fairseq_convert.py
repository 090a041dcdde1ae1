"""Fairseq Rel2Bbox checkpoint converter + dictionary-id bridge.

The reference pins `saved/coco_F_seq2seq_v9_ablation_4/checkpoint_90_0.0.pth`
(`inference_coco.py:467-477`), a fairseq-naming state dict
(`Model.py:533-628`: `…sentence_encoder.*`, `object_embedding` at
`Model.py:73-74`, `bbox_head.Decoder.*`).  The blob is missing from the
checkout, so these tests synthesize state dicts in that exact naming and
verify: (a) the converted backbone equals the HF-RoBERTa conversion when the
weights are the same (the HF path is forward-parity-tested), (b) the full
pytree structure matches LayoutPredictor exactly, (c) a fairseq .pth loads
end-to-end through `load_layout_predictor` and runs `LayoutInference`, and
(d) the `test-dictionary.pkl` id bridge maps GPT-2 ids to fairseq indices.
"""
import numpy as np
import jax
import pytest
import torch

from diffusion_spacetime_attn_tpu.config import LayoutConfig
from diffusion_spacetime_attn_tpu.utils import convert

TINY = LayoutConfig(
    vocab_size=120, hidden=32, layers=2, heads=2, ffn_dim=64,
    max_positions=40, max_len=8,
)

REF_DICT = ("/root/reference/layout_predictor/LayoutTransformer/"
            "configs/test-dictionary.pkl")


def _fairseq_sd_from_hf(hf_sd, n_layers, hidden, prefix="encoder.model.encoder."):
    """Build a fairseq-naming Rel2Bbox state dict carrying the SAME weights
    as a transformers RobertaModel state dict (key correspondence:
    fairseq `self_attn.{q,k,v,out}_proj` ↔ HF `attention.self.{query,key,value}`
    / `attention.output.dense`, `fc1/fc2` ↔ `intermediate/output.dense`,
    `self_attn_layer_norm/final_layer_norm` ↔ the two output LayerNorms)."""
    se = prefix + "sentence_encoder."
    sd = {
        se + "embed_tokens.weight": hf_sd["embeddings.word_embeddings.weight"],
        se + "embed_positions.weight": hf_sd["embeddings.position_embeddings.weight"],
        se + "layernorm_embedding.weight": hf_sd["embeddings.LayerNorm.weight"],
        se + "layernorm_embedding.bias": hf_sd["embeddings.LayerNorm.bias"],
        se + "object_embedding": np.random.RandomState(5).randn(1, hidden).astype(np.float32),
    }
    pairs = [
        ("self_attn.q_proj", "attention.self.query"),
        ("self_attn.k_proj", "attention.self.key"),
        ("self_attn.v_proj", "attention.self.value"),
        ("self_attn.out_proj", "attention.output.dense"),
        ("self_attn_layer_norm", "attention.output.LayerNorm"),
        ("fc1", "intermediate.dense"),
        ("fc2", "output.dense"),
        ("final_layer_norm", "output.LayerNorm"),
    ]
    for i in range(n_layers):
        for fs, hf in pairs:
            for suffix in ("weight", "bias"):
                sd[f"{se}layers.{i}.{fs}.{suffix}"] = hf_sd[
                    f"encoder.layer.{i}.{hf}.{suffix}"]
    return sd


def _add_head(sd, hidden, k=5, seed=6):
    r = np.random.RandomState(seed)
    sd["bbox_head.Decoder.output_Layer.weight"] = r.randn(hidden, hidden).astype(np.float32)
    sd["bbox_head.Decoder.output_Layer.bias"] = r.randn(hidden).astype(np.float32)
    sd["bbox_head.Decoder.box_predictor.xy_bivariate.weight"] = r.randn(
        6 * k, hidden).astype(np.float32)
    sd["bbox_head.Decoder.box_predictor.xy_bivariate.bias"] = r.randn(
        6 * k).astype(np.float32)
    # dead modules present in the real blob — must be ignored
    sd["bbox_head.Decoder.decoder.layers.0.dummy.weight"] = np.zeros((2, 2), np.float32)
    sd["bbox_head.refine_encoder.box_embedding.weight"] = np.zeros((4, 4), np.float32)
    sd["encoder.model.encoder.lm_head.dense.weight"] = np.zeros((hidden, hidden), np.float32)
    return sd


def _hf_tiny_sd():
    from transformers import RobertaConfig, RobertaModel

    hf_cfg = RobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, pad_token_id=1, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(11)
    hf = RobertaModel(hf_cfg, add_pooling_layer=False).eval()
    with torch.no_grad():
        hf.embeddings.token_type_embeddings.weight.zero_()
    return {k: v.numpy() for k, v in hf.state_dict().items()}


def test_fairseq_backbone_matches_hf_conversion():
    hf_sd = _hf_tiny_sd()
    fs_sd = _add_head(_fairseq_sd_from_hf(hf_sd, 2, 32), 32)
    got = convert.convert_fairseq_rel2bbox(fs_sd)
    expect_backbone = convert.convert_hf_roberta(hf_sd)
    for path, a in jax.tree_util.tree_leaves_with_path(expect_backbone):
        b = got["backbone"]
        for p in path:
            b = b[p.key]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))


def test_fairseq_full_pytree_structure_and_forward():
    from diffusion_spacetime_attn_tpu.models.layout.model import (
        create_layout_predictor,
    )

    model, params0 = create_layout_predictor(TINY, jax.random.PRNGKey(0))
    hf_sd = _hf_tiny_sd()
    fs_sd = _add_head(_fairseq_sd_from_hf(hf_sd, 2, 32), 32)
    params = convert.convert_fairseq_rel2bbox(fs_sd)

    shapes0 = jax.tree_util.tree_map(lambda x: x.shape, params0)
    shapes1 = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, params)
    assert shapes0 == shapes1  # exact structure AND shapes

    import jax.numpy as jnp

    tokens = jnp.array([[0, 7, 23, 45, 9, 2, 1, 1]], jnp.int32)
    obj = jnp.zeros((1, 8)).at[0, 2].set(1.0)
    raw = model.apply({"params": params}, tokens, obj)
    assert raw.shape == (1, 8, 30)
    assert np.isfinite(np.asarray(raw)).all()


def test_fairseq_pth_loads_end_to_end(tmp_path):
    """A .pth in reference naming (wrapped in the trainer's checkpoint dict
    format, `Pretrain.py:104-114`) loads via load_layout_predictor and
    drives LayoutInference."""
    from diffusion_spacetime_attn_tpu.pipeline.frontend import LayoutInference
    from diffusion_spacetime_attn_tpu.utils.loader import load_layout_predictor
    from diffusion_spacetime_attn_tpu.utils.tokenizer import make_roberta_tokenizer

    hf_sd = _hf_tiny_sd()
    fs_sd = _add_head(_fairseq_sd_from_hf(hf_sd, 2, 32), 32)
    path = tmp_path / "checkpoint_90_0.0.pth"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in fs_sd.items()},
         "log": {}, "n_steps": 0},
        path,
    )
    model, params = load_layout_predictor(TINY, str(path))
    # head must be the checkpoint's, not random: check one tensor
    np.testing.assert_array_equal(
        np.asarray(params["head"]["xy_bivariate"]["bias"]),
        fs_sd["bbox_head.Decoder.box_predictor.xy_bivariate.bias"],
    )
    tok = make_roberta_tokenizer()  # hash tokenizer (vocab 50265 > tiny 120)
    tok.vocab_size = 120
    inf = LayoutInference(model, params, tok, max_len=TINY.max_len)
    out = inf("a dog next to a cat")
    assert out is not None and set(out) == {"a dog", "a cat"}
    for xy in out.values():
        assert len(xy) == 2 and all(np.isfinite(xy))


def test_fairseq_dictionary_bridge():
    import os

    if not os.path.exists(REF_DICT):
        pytest.skip("reference dictionary not available")
    id_map = convert.load_fairseq_dictionary(REF_DICT)
    # known head of the frequency-ordered symbol list (inspected):
    # symbols[4]='13', symbols[5]='262' → gpt2 13→4, 262→5
    assert id_map[13] == 4
    assert id_map[262] == 5
    # bijective into [4, 50265), never colliding with specials 0..3
    vals = list(id_map.values())
    assert min(vals) >= 4 and len(set(vals)) == len(vals)
    assert len(id_map) > 50000


def test_tokenizer_id_map_bridge(tmp_path):
    """GPT2Tokenizer with id_map emits fairseq-space ids (specials 0/2/1
    unchanged, content remapped, unknown → 3)."""
    import json

    from diffusion_spacetime_attn_tpu.utils.tokenizer import GPT2Tokenizer

    vocab = {"a": 64, "Ġcat": 3797, "Ġthe": 262, "Ġ": 220,
             "c": 66, "at": 265, "Ġc": 269, "t": 83, "h": 71, "e": 68}
    merges = ["#version", "a t", "Ġ c", "Ġc at", "Ġ t", "h e", "Ġt he"]
    vp, mp = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("\n".join(merges))
    id_map = {262: 5, 3797: 2368, 64: 102}
    tok = GPT2Tokenizer(str(vp), str(mp), id_map=id_map)
    ids = tok.encode("a the cat")
    assert ids[0] == 0 and ids[-1] == 2          # fairseq <s>, </s>
    assert ids[1] == 102 and ids[2] == 5 and ids[3] == 2368
    assert tok.pad_to(ids, 8)[-2:] == [1, 1]     # fairseq <pad>
