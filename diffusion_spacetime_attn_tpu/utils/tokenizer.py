"""Tokenizers for the two text stacks.

* `CLIPTokenizer` — OpenAI CLIP BPE (used by FrozenCLIPEmbedder via HF and by
  `clip.tokenize` in the loss, reference `plms.py:32,39`).  Requires the BPE
  vocab file (`bpe_simple_vocab_16e6.txt.gz`) or HF `vocab.json`+`merges.txt`;
  this environment has no network and no cached vocab, so callers fall back
  to `HashTokenizer`.
* `GPT2Tokenizer` — byte-level BPE for RoBERTa (fairseq `roberta.encode`,
  reference `inference_coco.py:489`); same availability caveat.
* `HashTokenizer` — deterministic word-hash tokenizer for vocab-file-free
  operation (tests, random-weight benches).  One token per word ⇒ exact
  word↔token alignment, replacing fairseq `align_bpe_to_words`
  (`COCODataset.py:321`).

All tokenizers share: `encode(text) -> List[int]` and
`encode_with_alignment(words) -> (ids, word_to_first_token)`.
"""
from __future__ import annotations

import gzip
import hashlib
import json
import os
import re
from typing import List, Optional, Sequence, Tuple


def _hash_id(word: str, lo: int, hi: int) -> int:
    h = int.from_bytes(hashlib.sha1(word.encode()).digest()[:4], "little")
    return lo + (h % (hi - lo))


class HashTokenizer:
    """Deterministic 1-token-per-word tokenizer."""

    def __init__(
        self,
        vocab_size: int,
        bos: Optional[int] = 0,
        eos: Optional[int] = 2,
        pad: int = 1,
        reserved: int = 10,
        max_len: int = 77,
    ):
        self.vocab_size = vocab_size
        self.bos, self.eos, self.pad = bos, eos, pad
        self.lo = reserved
        self.max_len = max_len

    def _word_ids(self, words: Sequence[str]) -> List[int]:
        return [_hash_id(w.strip().lower(), self.lo, self.vocab_size) for w in words]

    def encode(self, text: str) -> List[int]:
        words = re.findall(r"\w+|[^\w\s]", text)
        ids = self._word_ids(words)
        if self.bos is not None:
            ids = [self.bos] + ids
        if self.eos is not None:
            ids = ids + [self.eos]
        return ids[: self.max_len]

    def encode_with_alignment(
        self, words: Sequence[str]
    ) -> Tuple[List[int], List[int]]:
        ids = [self.bos] if self.bos is not None else []
        align = []
        for w in words:
            align.append(len(ids))
            ids.append(self._word_ids([w])[0])
        if self.eos is not None:
            ids.append(self.eos)
        return ids[: self.max_len], align

    def pad_to(self, ids: List[int], length: int) -> List[int]:
        return (ids + [self.pad] * max(0, length - len(ids)))[:length]


def _bytes_to_unicode():
    """GPT-2 byte→unicode table."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class _BPE:
    def __init__(self, merges: List[Tuple[str, str]]):
        self.ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {}

    def __call__(self, token: str) -> List[str]:
        if token in self.cache:
            return self.cache[token]
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 30))
            if best not in self.ranks:
                break
            a, b = best
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        self.cache[token] = word
        return word


class GPT2Tokenizer:
    """Byte-level BPE (RoBERTa / GPT-2) from vocab.json + merges.txt."""

    PAT = re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\w\s]+|\s+(?!\S)|\s+",
        re.IGNORECASE,
    )

    def __init__(self, vocab_path: str, merges_path: str, bos=0, eos=2, pad=1,
                 id_map=None):
        """id_map: optional {gpt2_id: target_id} applied to content tokens
        (missing → 3 = <unk>) — the fairseq-dictionary bridge
        (`convert.load_fairseq_dictionary`); specials bos/eos/pad are already
        in the target id space (fairseq <s>=0, <pad>=1, </s>=2)."""
        with open(vocab_path) as f:
            self.vocab = json.load(f)
        if id_map is not None:
            self.vocab = {t: id_map.get(i, 3) for t, i in self.vocab.items()}
        with open(merges_path) as f:
            lines = f.read().split("\n")
        merges = [tuple(l.split()) for l in lines if l and not l.startswith("#")]
        self.bpe = _BPE([m for m in merges if len(m) == 2])
        self.byte_enc = _bytes_to_unicode()
        self.bos, self.eos, self.pad = bos, eos, pad

    def _tokens(self, text: str) -> List[int]:
        ids = []
        for tok in self.PAT.findall(text):
            tok = "".join(self.byte_enc[b] for b in tok.encode("utf-8"))
            ids.extend(self.vocab[t] for t in self.bpe(tok))
        return ids

    def encode(self, text: str) -> List[int]:
        return [self.bos] + self._tokens(text) + [self.eos]

    def encode_with_alignment(self, words: Sequence[str]):
        ids = [self.bos]
        align = []
        text = ""
        for i, w in enumerate(words):
            piece = w if i == 0 else " " + w
            align.append(len(ids))
            ids.extend(self._tokens(piece))
            text += piece
        ids.append(self.eos)
        return ids, align

    def pad_to(self, ids, length):
        return (ids + [self.pad] * max(0, length - len(ids)))[:length]


class CLIPTokenizer:
    """OpenAI CLIP BPE from bpe_simple_vocab_16e6.txt.gz (or HF merges)."""

    PAT = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\w]+|[^\s\w]+",
        re.IGNORECASE,
    )

    def __init__(self, bpe_path: str, max_len: int = 77):
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(_bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_enc = _bytes_to_unicode()
        self.max_len = max_len
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self.cache = {}

    def _bpe(self, token: str) -> List[str]:
        if token in self.cache:
            return self.cache[token]
        word = list(token[:-1]) + [token[-1] + "</w>"]
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if best not in self.bpe_ranks:
                break
            a, b = best
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        self.cache[token] = word
        return word

    def _clean(self, text: str) -> str:
        return re.sub(r"\s+", " ", text.strip()).lower()

    def tokenize(self, text: str) -> List[int]:
        ids = [self.sot]
        for tok in self.PAT.findall(self._clean(text)):
            tok = "".join(self.byte_enc[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok))
        ids.append(self.eot)
        ids = ids[: self.max_len]
        if ids[-1] != self.eot:
            ids[-1] = self.eot
        return ids + [0] * (self.max_len - len(ids))


def make_clip_tokenizer(vocab_path: Optional[str] = None, max_len: int = 77):
    """CLIP tokenizer if a vocab file is available, else HashTokenizer with
    CLIP's vocab size and special ids (sot=49406, eot=49407, pad=0)."""
    if vocab_path and os.path.exists(vocab_path):
        return CLIPTokenizer(vocab_path, max_len)
    return HashTokenizer(
        vocab_size=49406, bos=49406, eos=49407, pad=0, reserved=1000, max_len=max_len
    )


def make_roberta_tokenizer(
    vocab_path: Optional[str] = None,
    merges_path: Optional[str] = None,
    prefer_native: bool = True,
    fairseq_dict_path: Optional[str] = None,
):
    """RoBERTa BPE if vocab files available (native C++ core when the
    toolchain permits), else HashTokenizer with RoBERTa's special ids
    (bos=0, eos=2, pad=1).

    fairseq_dict_path: the reference's `configs/test-dictionary.pkl` — when
    given, content ids are emitted in the fairseq dictionary index space
    (what `roberta.encode` produces, `inference_coco.py:489-492`) so tokens
    line up with the reference layout checkpoint's embedding table.
    """
    id_map = None
    if fairseq_dict_path and os.path.exists(fairseq_dict_path):
        from .convert import load_fairseq_dictionary

        id_map = load_fairseq_dictionary(fairseq_dict_path)
    if vocab_path and merges_path and os.path.exists(vocab_path):
        if prefer_native:
            try:
                from .native_bpe import NativeBPE

                return NativeBPE.from_files(vocab_path, merges_path,
                                            id_map=id_map)
            except Exception:
                pass
        return GPT2Tokenizer(vocab_path, merges_path, id_map=id_map)
    return HashTokenizer(vocab_size=50265, bos=0, eos=2, pad=1, reserved=10)
