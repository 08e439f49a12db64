"""BM25: tokenizer/stemmer behavior, textbook-formula check, device kernel
vs host CSR scorer (SURVEY.md section 4(b))."""

import math

import jax.numpy as jnp
import numpy as np

from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
from hybrid_rag_colbertv2_tpu.index.textproc import (
    PorterStemmer,
    tokenize_lexical,
)
from hybrid_rag_colbertv2_tpu.ops.bm25 import bm25_scores_device

CORPUS = [
    "The quick brown fox jumps over the lazy dog",
    "A fast auburn fox leaped over sleeping hounds",
    "TPUs multiply matrices using a systolic array called the MXU",
    "JAX compiles numerical programs with XLA for TPUs and GPUs",
    "The dog sleeps while the fox runs through the forest",
    "Systolic arrays stream operands through a grid of multipliers",
    "Information retrieval ranks documents by relevance to a query",
    "BM25 is a classic lexical ranking function for retrieval",
]


def test_porter_stemmer_known_words():
    st = PorterStemmer()
    cases = {
        "caresses": "caress",
        "ponies": "poni",
        "cats": "cat",
        "feed": "feed",
        "agreed": "agre",
        "plastered": "plaster",
        "motoring": "motor",
        "happy": "happi",
        "relational": "relat",
        "conditional": "condit",
        "rational": "ration",
        "digitizer": "digit",
        "operator": "oper",
        "feudalism": "feudal",
        "hopefulness": "hope",
        "formaliti": "formal",
        "electriciti": "electr",
        "electrical": "electr",
        "hopeful": "hope",
        "goodness": "good",
        "revival": "reviv",
        "allowance": "allow",
        "inference": "infer",
        "airliner": "airlin",
        "adjustment": "adjust",
        "dependent": "depend",
        "adoption": "adopt",
        "activate": "activ",
        "effective": "effect",
        "probate": "probat",
        "rate": "rate",
        "controll": "control",
        "roll": "roll",
    }
    for w, expect in cases.items():
        assert st.stem(w) == expect, (w, st.stem(w), expect)


def test_tokenize_removes_stopwords_and_stems():
    toks = tokenize_lexical("The foxes were running quickly over the dogs!")
    assert "the" not in toks and "were" not in toks and "over" not in toks
    assert "fox" in toks and "run" in toks and "dog" in toks


def test_bm25_weights_match_textbook_formula():
    idx = LexicalIndex.build(CORPUS)
    n = len(CORPUS)
    doc_toks = [tokenize_lexical(t) for t in CORPUS]
    avgdl = sum(len(t) for t in doc_toks) / n
    term = "fox"
    tid = idx.vocab[term]
    df = sum(1 for toks in doc_toks if term in toks)
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    s, e = idx.indptr[tid], idx.indptr[tid + 1]
    assert e - s == df
    for pos in range(s, e):
        d = int(idx.post_docs[pos])
        tf = doc_toks[d].count(term)
        dl = len(doc_toks[d])
        expect = idf * tf * 2.5 / (tf + 1.5 * (1 - 0.75 + 0.75 * dl / avgdl))
        np.testing.assert_allclose(idx.post_weights[pos], expect, rtol=1e-5)


def test_device_scores_match_host():
    idx = LexicalIndex.build(CORPUS)
    queries = [
        "fox jumping over dog",
        "systolic array matrix multiply",
        "lexical retrieval ranking",
        "nonexistentterm anotherunknown",
    ]
    q_ids = np.stack([idx.encode_query(q) for q in queries])
    got = bm25_scores_device(
        jnp.asarray(q_ids),
        jnp.asarray(idx.indptr),
        jnp.asarray(idx.post_docs),
        jnp.asarray(idx.post_weights),
        n_docs=idx.n_docs,
        max_postings=idx.max_postings,
    )
    for i, q in enumerate(queries):
        host = idx.score_host(q)
        np.testing.assert_allclose(np.asarray(got[i]), host,
                                   rtol=1e-5, atol=1e-6)


def test_bm25_ranking_sanity():
    idx = LexicalIndex.build(CORPUS)
    scores = idx.score_host("fox jumps over the lazy dog")
    assert int(np.argmax(scores)) == 0  # doc 0 is the near-exact match
    scores2 = idx.score_host("systolic array MXU")
    assert int(np.argmax(scores2)) in (2, 5)


def test_save_load_roundtrip(tmp_path):
    idx = LexicalIndex.build(CORPUS)
    idx.save(tmp_path / "bm25")
    idx2 = LexicalIndex.load(tmp_path / "bm25")
    q = "fox and dog in the forest"
    np.testing.assert_allclose(idx.score_host(q), idx2.score_host(q))
    assert idx2.max_postings == idx.max_postings


def test_postings_cap_exact_when_cap_covers_df():
    import numpy as np
    idx = LexicalIndex.build(CORPUS)
    capped = LexicalIndex.build(CORPUS, postings_cap=len(CORPUS))
    q = "fox jumps over the lazy dog"
    np.testing.assert_allclose(capped.score_host(q), idx.score_host(q),
                               rtol=1e-6)
    assert capped.max_postings <= idx.max_postings


def test_postings_cap_truncates_low_weight_tail():
    import numpy as np
    rng = np.random.default_rng(0)
    # zipf-ish corpus: 'common' appears everywhere (low idf), rare terms in
    # few docs; the capped index must keep rare-term rankings intact
    corpus = [f"common filler rare{i % 40} text" for i in range(400)]
    exact = LexicalIndex.build(corpus)
    capped = LexicalIndex.build(corpus, postings_cap=16)
    # every postings list now <= 16
    df = np.diff(capped.indptr)
    assert df.max() <= 16
    q = "rare7 common"
    top_exact = set(np.argsort(-exact.score_host(q))[:10].tolist())
    top_capped = set(np.argsort(-capped.score_host(q))[:10].tolist())
    # docs containing rare7 (10 of them) dominate both rankings
    rare_docs = {i for i in range(400) if i % 40 == 7}
    assert len(top_exact & rare_docs) == 10
    assert len(top_capped & rare_docs) == 10


def test_topk_matches_dense_scorer():
    """Sort-based bm25_topk_device must agree with the dense-scatter scorer
    (exact — same totals, same top-k sets)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hybrid_rag_colbertv2_tpu.ops.bm25 import (
        bm25_scores_device, bm25_topk_device)

    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(60)]
    corpus = [" ".join(rng.choice(vocab, size=rng.integers(4, 12)))
              for _ in range(300)]
    idx = LexicalIndex.build(corpus)
    queries = [
        "w1 w2 w3", "w10 w10 w10 w4",          # duplicates accumulate
        "zzz unknown only",                     # OOV -> all -1
        " ".join(rng.choice(vocab, size=6)),
    ]
    q = jnp.asarray(np.stack([idx.encode_query(x, 16) for x in queries]))
    lexd = (jnp.asarray(idx.indptr), jnp.asarray(idx.post_docs),
            jnp.asarray(idx.post_weights))
    k = 20
    dense = bm25_scores_device(q, *lexd, n_docs=idx.n_docs,
                               max_postings=idx.max_postings)
    dv, di = jax.lax.top_k(dense, k)
    tv, ti = bm25_topk_device(q, *lexd, n_docs=idx.n_docs,
                              max_postings=idx.max_postings, k=k)
    dv, di, tv, ti = map(np.asarray, (dv, di, tv, ti))
    for b in range(len(queries)):
        np.testing.assert_allclose(np.where(dv[b] > 0, dv[b], 0.0),
                                   np.where(tv[b] > 0, tv[b], 0.0),
                                   rtol=1e-5, atol=1e-6, err_msg=str(b))
        pos_d = {int(i) for i, v in zip(di[b], dv[b]) if v > 0}
        pos_t = {int(i) for i in ti[b] if i >= 0}
        # equal candidate sets except ties at the k-th score
        kth = sorted((v for v in dv[b] if v > 0), reverse=True)
        if len(pos_d) == k and kth and kth[-1] > 0:
            shared = pos_d & pos_t
            assert len(shared) >= k - 3, (b, pos_d, pos_t)
        else:
            assert pos_d == pos_t, b
    # OOV row fully empty
    assert (ti[2] == -1).all() and (tv[2] <= 0).all()


def test_lexical_load_legacy_meta_defaults_to_porter(tmp_path):
    """Indexes persisted before the stemmer was recorded were built with
    Porter-1980; loading them as 'snowball' would stem queries differently
    from the stored postings and silently drop matching terms."""
    import json

    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex

    lex = LexicalIndex.build(["the dying embers", "national parks"],
                             stemmer="porter")
    lex.save(tmp_path / "idx")
    meta_path = tmp_path / "idx" / "meta.json"
    meta = json.loads(meta_path.read_text())
    del meta["stemmer"]                            # simulate legacy index
    meta_path.write_text(json.dumps(meta))
    loaded = LexicalIndex.load(tmp_path / "idx")
    assert loaded.stemmer == "porter"
    # the legacy index still matches its own corpus's stemming
    assert (loaded.encode_query("dying") >= 0).sum() == 1


def test_contraction_tokenization_matches_reference_behavior():
    """bm25s tokenizes with \\b\\w\\w+\\b: apostrophes split, 1-char
    fragments drop, and contraction stems ('don') are stopwords — none of
    don't/it's/isn't may leak scoring terms (code-review r2)."""
    from hybrid_rag_colbertv2_tpu.index.textproc import tokenize_lexical

    toks = tokenize_lexical(
        "it's what we don't know that hurts, isn't it? won't stop!")
    assert toks == ["know", "hurt", "stop"]
    # single letters never become terms
    assert tokenize_lexical("a b c x1 t s") == ["x1"]


def test_topk_window_at_postings_array_end():
    """The slice-window gather shifts a term's read window left when its
    postings run to the very end of the array (start > nnz - P); the
    validity mask shifts with it. Craft a CSR whose LAST term has fewer
    postings than max_postings and sits flush against the array end, and
    check device top-k totals equal a host-side accumulation."""
    import jax

    from hybrid_rag_colbertv2_tpu.ops.bm25 import bm25_topk_device

    # postings: term 0 -> 6 entries, term 1 -> 2 entries (flush at end)
    indptr = jnp.asarray(np.array([0, 6, 8], np.int32))
    post_docs = jnp.asarray(np.array([0, 2, 4, 5, 7, 9, 2, 7], np.int32))
    post_w = jnp.asarray(
        np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 10.0, 20.0], np.float32))
    q = jnp.asarray(np.array([[1, 0, -1, -1]], np.int32))  # both terms
    max_postings = 6                   # > term 1's 2 entries; 8-6 < start=6
    vals, ids = bm25_topk_device(
        q, indptr, post_docs, post_w, n_docs=10, max_postings=max_postings,
        k=4)
    vals, ids = np.asarray(vals)[0], np.asarray(ids)[0]
    # host truth: doc totals = term0 + term1 contributions
    want = {0: 1.0, 2: 2.0 + 10.0, 4: 3.0, 5: 4.0, 7: 5.0 + 20.0, 9: 6.0}
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert [i for i, _ in top] == ids.tolist()
    np.testing.assert_allclose([v for _, v in top], vals, rtol=1e-6)
