"""Native C++ BPE core vs the Python reference implementation."""
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.utils.tokenizer import GPT2Tokenizer, _BPE, _bytes_to_unicode


def make_toy_vocab():
    """Small byte-level vocab: all single byte-units + some merges."""
    units = list(_bytes_to_unicode().values())
    merges = [
        ("t", "h"), ("th", "e"), ("Ġ", "c"), ("Ġc", "a"), ("Ġca", "t"),
        ("a", "n"), ("Ġ", "d"), ("Ġd", "o"), ("Ġdo", "g"), ("o", "g"),
    ]
    vocab = {u: i for i, u in enumerate(units)}
    n = len(vocab)
    for a, b in merges:
        vocab[a + b] = n
        n += 1
    return vocab, merges


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    from diffusion_spacetime_attn_tpu.utils.native_bpe import NativeBPE, load_library

    if load_library() is None:
        pytest.skip("no native toolchain")
    vocab, merges = make_toy_vocab()
    native = NativeBPE(vocab, merges)

    # python reference with the same tables
    import json

    d = tmp_path_factory.mktemp("bpe")
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version\n" + "\n".join(f"{a} {b}" for a, b in merges)
    )
    py = GPT2Tokenizer(str(d / "vocab.json"), str(d / "merges.txt"))
    return native, py


SENTENCES = [
    "the cat and the dog",
    "The silver bed was situated to the right of the white couch.",
    "a, b; c! 'll don't 123 mixed42words",
    "multiple   spaces\tand\nnewlines",
]


def test_native_matches_python(pair):
    native, py = pair
    for s in SENTENCES:
        assert native.encode(s) == py.encode(s), s


def test_alignment_matches(pair):
    native, py = pair
    words = ["the", "cat", "sat", "on", "a", "dog"]
    n_ids, n_align = native.encode_with_alignment(words)
    p_ids, p_align = py.encode_with_alignment(words)
    assert n_ids == p_ids
    assert n_align == p_align
