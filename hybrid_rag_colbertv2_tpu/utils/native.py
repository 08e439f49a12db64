"""ctypes loader for the native text-processing library (csrc/textproc.cpp).

The shared library is optional: when present (built via ``make -C csrc`` or
``python -m hybrid_rag_colbertv2_tpu.utils.native --build``) the lexical
pipeline uses it; otherwise the pure-Python implementation in
index/textproc.py is used. Both are tested byte-identical
(tests/test_native.py). Set HRAG_NO_NATIVE=1 to force the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path
from typing import List, Optional

_LIB_PATH = Path(__file__).parent.parent / "_native" / "libhrag_textproc.so"
_CSRC = Path(__file__).parent.parent.parent / "csrc"
_lib = None
_load_failed = False


def build(verbose: bool = True) -> bool:
    """Compile the native library. Returns True on success."""
    try:
        r = subprocess.run(["make", "-C", str(_CSRC)], capture_output=True,
                           text=True, timeout=120)
        if r.returncode != 0:
            if verbose:
                print(r.stdout + r.stderr, file=sys.stderr)
            return False
        if _LIB_PATH.exists():
            # a failed get_lib() before the build latched _load_failed;
            # clear it so the fresh library actually gets used
            global _load_failed
            _load_failed = False
            return True
        return False
    except Exception as e:
        if verbose:
            print(f"native build failed: {e}", file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (once) and return the native library, or None."""
    global _lib, _load_failed
    if os.environ.get("HRAG_NO_NATIVE"):
        return None
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not _LIB_PATH.exists():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.hrag_tokenize_corpus.restype = ctypes.POINTER(ctypes.c_char)
        lib.hrag_tokenize_corpus.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64)]
        lib.hrag_stem.restype = ctypes.POINTER(ctypes.c_char)
        lib.hrag_stem.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                  ctypes.c_int32,
                                  ctypes.POINTER(ctypes.c_int64)]
        lib.hrag_build_postings.restype = ctypes.POINTER(ctypes.c_char)
        lib.hrag_build_postings.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64)]
        lib.hrag_free.argtypes = [ctypes.POINTER(ctypes.c_char)]
        lib.hrag_abi_version.restype = ctypes.c_int32
        if lib.hrag_abi_version() != 3:
            raise RuntimeError("native ABI mismatch")
        _lib = lib
        return _lib
    except Exception:
        _load_failed = True
        return None


_STEM_ALGOS = {"snowball": 1, "porter": 2}


def tokenize_corpus_native(corpus: List[str], stem: bool = True,
                           stemmer: str = "snowball"
                           ) -> Optional[List[List[str]]]:
    """Batch tokenize+stem via the native library; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    if not corpus:
        # ''.split(chr(30)) on the C side would yield one phantom empty
        # doc; the contract is len(result) == len(corpus)
        return []
    algo = _STEM_ALGOS[stemmer] if stem else 0
    # \x1e is the document separator in the C ABI; sanitize it out of the
    # texts (PDF-extracted text can contain control bytes) so the returned
    # doc count always matches len(corpus). The Python tokenizer treats
    # \x1e as a non-word delimiter, so replacing with a space is
    # token-identical to the fallback path.
    # lowercase HERE with Python's str.lower() so Unicode chars whose
    # lowercase is ASCII (e.g. U+212A KELVIN SIGN -> 'k', seen in PDF/OCR
    # text) tokenize identically to the pure-Python path — the C side
    # only ASCII-lowers, which would split corpus vs query vocabularies
    joined = "\x1e".join(
        t.lower().replace("\x1e", " ") for t in corpus).encode(
        "utf-8", errors="replace")
    out_len = ctypes.c_int64()
    buf = lib.hrag_tokenize_corpus(joined, len(joined), algo,
                                   ctypes.byref(out_len))
    try:
        raw = ctypes.string_at(buf, out_len.value).decode("utf-8",
                                                          errors="replace")
    finally:
        lib.hrag_free(buf)
    docs = raw.split("\x1e")
    return [d.split(" ") if d else [] for d in docs]


def build_postings_native(corpus: List[str], stem: bool = True,
                          stemmer: str = "snowball"):
    """One-pass tokenize + (term, doc) -> tf aggregation in C++.

    -> (vocab_terms: List[str] lexicographically sorted,
        tids, dids, tfs: int32 arrays in (term, doc) order,
        doc_lens: int32 (n_docs,)) or None when the library is absent.

    Replaces the string-heavy half of LexicalIndex.build (tokenize,
    np.unique over all tokens, pair aggregation); the numeric half (idf,
    BM25 weights, postings cap, CSR assembly) stays in numpy so the
    result is bit-identical to the pure-Python path by construction
    (tested in tests/test_native.py)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    if not corpus:
        return ([], np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros(0, np.int32), np.zeros(0, np.int32))
    algo = _STEM_ALGOS[stemmer] if stem else 0
    # same sanitization contract as tokenize_corpus_native (see there)
    joined = "\x1e".join(
        t.lower().replace("\x1e", " ") for t in corpus).encode(
        "utf-8", errors="replace")
    out_len = ctypes.c_int64()
    buf = lib.hrag_build_postings(joined, len(joined), algo,
                                  ctypes.byref(out_len))
    try:
        raw = ctypes.string_at(buf, out_len.value)
    finally:
        lib.hrag_free(buf)
    n_docs, n_terms, nnz, vocab_bytes = np.frombuffer(
        raw, np.int64, count=4)

    def pad8(x):
        return (int(x) + 7) & ~7

    off = 32
    vocab_blob = raw[off:off + vocab_bytes].decode("utf-8")
    vocab_terms = vocab_blob.split(" ") if vocab_bytes else []
    assert len(vocab_terms) == n_terms, (len(vocab_terms), n_terms)
    off += pad8(vocab_bytes)
    doc_lens = np.frombuffer(raw, np.int32, count=int(n_docs),
                             offset=off).copy()
    off += pad8(n_docs * 4)
    tids = np.frombuffer(raw, np.int32, count=int(nnz), offset=off).copy()
    off += pad8(nnz * 4)
    dids = np.frombuffer(raw, np.int32, count=int(nnz), offset=off).copy()
    off += pad8(nnz * 4)
    tfs = np.frombuffer(raw, np.int32, count=int(nnz), offset=off).copy()
    return vocab_terms, tids, dids, tfs, doc_lens


def stem_native(word: str, stemmer: str = "snowball") -> Optional[str]:
    lib = get_lib()
    if lib is None:
        return None
    w = word.encode("utf-8", errors="replace")
    out_len = ctypes.c_int64()
    buf = lib.hrag_stem(w, len(w), _STEM_ALGOS[stemmer],
                        ctypes.byref(out_len))
    try:
        return ctypes.string_at(buf, out_len.value).decode("utf-8")
    finally:
        lib.hrag_free(buf)


if __name__ == "__main__":
    if "--build" in sys.argv:
        ok = build()
        print("built" if ok else "build failed")
        sys.exit(0 if ok else 1)
    print(f"native lib present: {_LIB_PATH.exists()} at {_LIB_PATH}")
