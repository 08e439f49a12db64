"""Environment smoke tests + checkpoint conversion CLI.

Replaces the reference's ``model_downloader_simplified.py`` (pip installer +
hub downloader + 4 import smoke tests, :16-173). This environment never
installs or downloads; instead:

  * ``python -m hybrid_rag_colbertv2_tpu.tools.check_env`` runs behavioral
    smoke tests: JAX devices, a Pallas kernel round trip, BM25 index+query,
    tokenizer training, encoder forward, native library;
  * ``python -m hybrid_rag_colbertv2_tpu.tools.check_env --convert <hf_dir>
    <out.npz>`` converts a local HF checkpoint to framework params
    (models/convert.py) — the offline equivalent of the reference's
    ``--download-all``.
"""

from __future__ import annotations

import sys
import traceback
from typing import Callable, List, Tuple


def _t_jax() -> str:
    import jax

    devs = jax.devices()
    return f"{jax.default_backend()} x{len(devs)}: {devs[0]}"


def _t_pallas() -> str:
    import jax.numpy as jnp
    import numpy as np

    from hybrid_rag_colbertv2_tpu.ops.maxsim import (
        maxsim_scores, maxsim_scores_exact)

    rng = np.random.default_rng(0)
    docs = rng.standard_normal((16, 32, 128)).astype(np.float32)
    lengths = np.full((16,), 32, np.int32)
    q = rng.standard_normal((1, 32, 128)).astype(np.float32)
    ref = maxsim_scores_exact(jnp.asarray(q), jnp.asarray(docs),
                              jnp.asarray(lengths))
    got = maxsim_scores(jnp.asarray(q), jnp.asarray(docs.reshape(-1, 128)),
                        jnp.asarray(lengths), doc_len=32)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 0.05, err
    return f"MaxSim kernel max|err|={err:.2e}"


def _t_pallas_int8() -> str:
    """Compiled int8 kernel vs exact fp32 on dequantized embeddings — the
    on-device guard for the production index dtype (CPU tests run the
    kernel in interpret mode only)."""
    import jax.numpy as jnp
    import numpy as np

    from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
    from hybrid_rag_colbertv2_tpu.ops.maxsim import (
        maxsim_scores_exact, maxsim_scores_int8)

    rng = np.random.default_rng(1)
    toks = rng.standard_normal((16, 32, 128)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    lengths = rng.integers(16, 33, 16).astype(np.int32)
    idx = DenseTokenIndex.build(jnp.asarray(toks), jnp.asarray(lengths),
                                doc_len=32, dtype="int8")
    q = rng.standard_normal((2, 32, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    deq = (idx.emb_flat.reshape(idx.n_pad, 32, 128).astype(jnp.float32)
           * idx.scales.reshape(idx.n_pad, 32)[..., None])
    ref = maxsim_scores_exact(jnp.asarray(q), deq, idx.doc_lengths)
    got = maxsim_scores_int8(jnp.asarray(q), idx.emb_flat, idx.scales,
                             idx.doc_lengths, doc_len=32)
    err = float(jnp.max(jnp.abs(got[:, :16] - ref[:, :16])))
    # bf16 matmul on dequantized-magnitude scores (~|32|): allow 0.5%
    assert err < 0.2, err
    return f"int8 MaxSim kernel max|err|={err:.2e}"


def _t_pallas_int8_doc() -> str:
    """Compiled "int8-doc" kernel (per-document scales, duplicated padding
    rows, dequant after the max) vs exact fp32 on dequantized values."""
    import jax.numpy as jnp
    import numpy as np

    from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
    from hybrid_rag_colbertv2_tpu.ops.maxsim import (
        maxsim_scores_exact, maxsim_scores_int8_doc)

    rng = np.random.default_rng(2)
    toks = rng.standard_normal((16, 32, 128)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    lengths = rng.integers(16, 33, 16).astype(np.int32)
    idx = DenseTokenIndex.build(jnp.asarray(toks), jnp.asarray(lengths),
                                doc_len=32, dtype="int8-doc")
    q = rng.standard_normal((2, 32, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    deq = (idx.emb_flat.reshape(idx.n_pad, 32, 128).astype(jnp.float32)
           * idx.doc_scales[:, None, None])
    ref = maxsim_scores_exact(jnp.asarray(q), deq, idx.doc_lengths)
    got = maxsim_scores_int8_doc(jnp.asarray(q), idx.emb_flat,
                                 idx.doc_scales, idx.doc_lengths, doc_len=32)
    err = float(jnp.max(jnp.abs(got[:, :16] - ref[:, :16])))
    assert err < 0.2, err
    return f"int8-doc MaxSim kernel max|err|={err:.2e}"


def _t_pallas_int4_doc() -> str:
    """Compiled "int4-doc" kernel (nibble-packed token-row pairs at full
    lane width, per-token-group scales) vs exact fp32 on dequantized
    values."""
    import jax.numpy as jnp
    import numpy as np

    from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
    from hybrid_rag_colbertv2_tpu.ops.maxsim import (
        maxsim_scores_exact, maxsim_scores_int4_doc)
    from hybrid_rag_colbertv2_tpu.ops.quant import dequantize_int4_groups

    rng = np.random.default_rng(3)
    toks = rng.standard_normal((16, 32, 128)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    lengths = rng.integers(16, 33, 16).astype(np.int32)
    idx = DenseTokenIndex.build(jnp.asarray(toks), jnp.asarray(lengths),
                                doc_len=32, dtype="int4-doc")
    q = rng.standard_normal((2, 32, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    deq = dequantize_int4_groups(idx.emb_flat, idx.doc_scales).reshape(
        idx.n_pad, 32, 128)
    ref = maxsim_scores_exact(jnp.asarray(q), deq, idx.doc_lengths)
    got = maxsim_scores_int4_doc(jnp.asarray(q), idx.emb_flat,
                                 idx.doc_scales, idx.doc_lengths,
                                 doc_len=32)
    err = float(jnp.max(jnp.abs(got[:, :16] - ref[:, :16])))
    assert err < 0.2, err
    return f"int4-doc MaxSim kernel max|err|={err:.2e}"


def _t_bm25() -> str:
    # behavioral parity with the reference's Test 1
    # (model_downloader_simplified.py:118-127): 2-doc index + query
    import jax.numpy as jnp
    import numpy as np

    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
    from hybrid_rag_colbertv2_tpu.ops.bm25 import bm25_scores_device

    idx = LexicalIndex.build(["a cat sits on the mat", "dogs chase cats"])
    s = bm25_scores_device(
        jnp.asarray(np.stack([idx.encode_query("cat")])),
        jnp.asarray(idx.indptr), jnp.asarray(idx.post_docs),
        jnp.asarray(idx.post_weights), n_docs=2,
        max_postings=idx.max_postings)
    assert float(s[0, 0]) > 0 and float(s[0, 1]) > 0
    return "BM25 index+query round trip OK"


def _t_tokenizer() -> str:
    from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer

    tok = ColBERTTokenizer.train_bpe(["hello world"] * 8, vocab_size=300)
    ids = tok.encode_query("hello", 16)
    assert ids[0] == tok.bos
    return f"BPE trainable offline (vocab {tok.vocab_size})"


def _t_encoder() -> str:
    from hybrid_rag_colbertv2_tpu.models.colbert import (
        ColBERTConfig, ColBERTEncoder)
    from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer

    tok = ColBERTTokenizer.train_bpe(["quick brown fox"] * 4, vocab_size=300)
    enc = ColBERTEncoder(ColBERTConfig.tiny(vocab_size=tok.vocab_size), tok)
    q = enc.encode_queries(["fox"])
    assert q.shape[-1] == 32
    return f"encoder forward OK {tuple(q.shape)}"


def _t_fused_cascade() -> str:
    """The production serving path: encoder forward + full hybrid cascade
    in ONE jitted dispatch with ONE packed transfer (retrieval/cascade.py
    HybridRetriever), including the final_fusion selector."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
    from hybrid_rag_colbertv2_tpu.models.colbert import (
        ColBERTConfig, ColBERTEncoder)
    from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import (
        hybrid_cascade, pack_query_batch)

    corpus = [f"doc {i} about topic{i % 7} and topic{(i + 3) % 7}"
              for i in range(40)]
    lex = LexicalIndex.build(corpus)
    tok = ColBERTTokenizer.train_bpe(corpus, vocab_size=300)
    enc = ColBERTEncoder(ColBERTConfig.tiny(vocab_size=tok.vocab_size), tok)
    embs, lens = enc.encode_docs(corpus, doc_len=16)
    dense = DenseTokenIndex.build(embs, lens, doc_len=16, dtype="int8")
    lq = enc.cfg.query_max_tokens
    model = enc.model

    @jax.jit
    def fused(params, packed, ip, pd, pw, emb, sc, lens_d):
        q_ids = packed[:, :lq]
        q_emb = model.apply({"params": params}, q_ids, jnp.ones_like(q_ids))
        ids, scores, _ = hybrid_cascade(
            q_emb, packed[:, lq:], ip, pd, pw, emb, sc, lens_d, None, None,
            prefilter=0, n_docs=dense.n_docs,
            max_postings=lex.max_postings, doc_len=16, is_int8=True,
            k_each=20, k_fuse=10, k_final=5, final_fusion="rrf")
        return ids, scores

    packed = pack_query_batch(enc, lex, ["topic3 doc"], None)
    ids, scores = fused(enc.params, packed, jnp.asarray(lex.indptr),
                        jnp.asarray(lex.post_docs),
                        jnp.asarray(lex.post_weights),
                        dense.emb_flat, dense.scales, dense.doc_lengths)
    ids = np.asarray(ids)
    assert ids.shape == (1, 5) and (ids[0] >= 0).all()
    return f"one-dispatch retrieve OK (top ids {ids[0][:3].tolist()})"


def _t_native() -> str:
    from hybrid_rag_colbertv2_tpu.utils.native import get_lib, stem_native

    if get_lib() is None:
        return "native lib NOT built (pure-Python fallback active) — " \
               "build with: make -C csrc"
    assert stem_native("running") == "run"
    return "native textproc lib loaded"


TESTS: List[Tuple[str, Callable[[], str]]] = [
    ("jax backend", _t_jax),
    ("pallas maxsim", _t_pallas),
    ("pallas maxsim int8", _t_pallas_int8),
    ("pallas maxsim int8-doc", _t_pallas_int8_doc),
    ("pallas maxsim int4-doc", _t_pallas_int4_doc),
    ("bm25 end-to-end", _t_bm25),
    ("tokenizer", _t_tokenizer),
    ("encoder", _t_encoder),
    ("fused one-dispatch cascade", _t_fused_cascade),
    ("native textproc", _t_native),
]


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv[:1] == ["--convert"]:
        if len(argv) != 3:
            print("usage: check_env --convert <hf_checkpoint_dir> <out.npz>")
            return 2
        from hybrid_rag_colbertv2_tpu.models.colbert import (
            ColBERTConfig, ColBERTEncoder)
        from hybrid_rag_colbertv2_tpu.models.convert import (
            colbert_config_from_hf, convert_hf_dir)

        try:
            # geometry + rotary settings from the checkpoint's config.json
            cfg = colbert_config_from_hf(argv[1])
        except FileNotFoundError:
            cfg = ColBERTConfig.jina_colbert_v2()
        params = convert_hf_dir(argv[1], cfg)
        import numpy as np

        enc = ColBERTEncoder.__new__(ColBERTEncoder)
        enc.params = params
        ColBERTEncoder.save_params(enc, argv[2])
        print(f"converted {argv[1]} -> {argv[2]}")
        return 0

    failures = 0
    for name, fn in TESTS:
        try:
            msg = fn()
            print(f"  [ok]   {name}: {msg}")
        except Exception as e:
            failures += 1
            print(f"  [FAIL] {name}: {e}")
            if "-v" in argv:
                traceback.print_exc()
    print(f"\n{len(TESTS) - failures}/{len(TESTS)} checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
