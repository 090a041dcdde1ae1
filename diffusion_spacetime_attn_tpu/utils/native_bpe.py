"""ctypes binding for the native C++ BPE core (native/bpe.cpp).

Drop-in accelerator for the merge loop of `utils.tokenizer.GPT2Tokenizer`;
encodings are verified against the Python implementation in tests.  Builds
the shared library on first use (`make -C native`) and silently falls back
to pure Python when a toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import List, Optional

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbpe.so")


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH):
        return _LIB_PATH
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH if os.path.exists(_LIB_PATH) else None
    except Exception:
        return None


_lib = None


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.bpe_create.restype = ctypes.c_void_p
    lib.bpe_create.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_int32,
    ]
    lib.bpe_encode.restype = ctypes.c_int32
    lib.bpe_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.bpe_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeBPE:
    """Byte-level BPE encoder backed by the C++ core."""

    def __init__(self, vocab: dict, merges: List[tuple], bos=0, eos=2, pad=1):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native BPE library unavailable")
        self._lib = lib
        tokens = list(vocab.keys())
        ids = (ctypes.c_int32 * len(tokens))(*[vocab[t] for t in tokens])
        tokens_blob = "\n".join(tokens).encode("utf-8")
        merges_blob = "\n".join(f"{a} {b}" for a, b in merges).encode("utf-8")
        self._h = lib.bpe_create(
            tokens_blob, ids, len(tokens), merges_blob, len(merges)
        )
        self.bos, self.eos, self.pad = bos, eos, pad

    @classmethod
    def from_files(cls, vocab_path: str, merges_path: str, id_map=None, **kw):
        """id_map: optional {gpt2_id: target_id} content-id remap (fairseq
        dictionary bridge; missing → 3 = <unk>) — applied at vocab build so
        the C++ core emits target-space ids directly."""
        with open(vocab_path) as f:
            vocab = json.load(f)
        if id_map is not None:
            vocab = {t: id_map.get(i, 3) for t, i in vocab.items()}
        with open(merges_path) as f:
            lines = f.read().split("\n")
        merges = [
            tuple(l.split()) for l in lines if l and not l.startswith("#")
        ]
        merges = [m for m in merges if len(m) == 2]
        return cls(vocab, merges, **kw)

    def encode_raw(self, text: str) -> List[int]:
        buf = (ctypes.c_int32 * 512)()
        n = self._lib.bpe_encode(self._h, text.encode("utf-8"), buf, 512)
        return list(buf[: min(n, 512)])

    def encode(self, text: str) -> List[int]:
        return [self.bos] + self.encode_raw(text) + [self.eos]

    def encode_with_alignment(self, words):
        ids = [self.bos]
        align = []
        for i, w in enumerate(words):
            piece = w if i == 0 else " " + w
            align.append(len(ids))
            ids.extend(self.encode_raw(piece))
        ids.append(self.eos)
        return ids, align

    def pad_to(self, ids, length):
        return (ids + [self.pad] * max(0, length - len(ids)))[:length]

    def __del__(self):
        try:
            self._lib.bpe_free(self._h)
        except Exception:
            pass
