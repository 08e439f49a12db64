"""Numerics: Pallas MaxSim kernels vs the naive einsum reference
(SURVEY.md section 4(b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.ops.maxsim import (
    maxsim_scores,
    maxsim_scores_exact,
    maxsim_scores_int8,
    maxsim_scores_int8_doc,
)
from hybrid_rag_colbertv2_tpu.ops.quant import (
    quantize_int8_docs,
    quantize_int8_rows,
)


def _make_case(rng, n=40, l=64, d=128, b=2, lq=32):
    docs = rng.standard_normal((n, l, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
    lengths = rng.integers(1, l + 1, size=(n,)).astype(np.int32)
    # zero out padding token rows (index builder invariant)
    tok = np.arange(l)
    docs = docs * (tok[None, :, None] < lengths[:, None, None])
    q = rng.standard_normal((b, lq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    # zero-pad some query rows (encoder invariant: padded rows are zero)
    q[:, lq - 4 :, :] = 0.0
    return jnp.asarray(q), jnp.asarray(docs), jnp.asarray(lengths)


def test_exact_reference_masks_padding(rng):
    q, docs, lengths = _make_case(rng)
    scores = maxsim_scores_exact(q, docs, lengths)
    # hand-computed for doc 0, query 0
    n, l, d = docs.shape
    s0 = 0.0
    for qi in range(q.shape[1]):
        qv = np.asarray(q)[0, qi]
        if not qv.any():
            continue
        sims = np.asarray(docs)[0, : int(lengths[0])] @ qv
        s0 += sims.max()
    np.testing.assert_allclose(float(scores[0, 0]), s0, rtol=1e-5)


def test_pallas_matches_exact_f32(rng):
    q, docs, lengths = _make_case(rng)
    n, l, d = docs.shape
    ref = maxsim_scores_exact(q, docs, lengths)
    got = maxsim_scores(
        q, docs.reshape(n * l, d), lengths, doc_len=l
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_pallas_pads_ragged_doc_count(rng):
    # n not a multiple of docs_per_tile exercises the padding path
    q, docs, lengths = _make_case(rng, n=37, l=32)
    n, l, d = docs.shape
    ref = maxsim_scores_exact(q, docs, lengths)
    got = maxsim_scores(q, docs.reshape(n * l, d), lengths,
                        doc_len=l, docs_per_tile=16)
    assert got.shape == (2, 37)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_pallas_int8_close_and_rank_preserving(rng):
    q, docs, lengths = _make_case(rng, n=64, l=64)
    n, l, d = docs.shape
    flat = docs.reshape(n * l, d)
    qv, scales = quantize_int8_rows(flat)
    ref = maxsim_scores_exact(q, docs, lengths)
    got = maxsim_scores_int8(q, qv, scales, lengths, doc_len=l)
    # int8 introduces ~1% error; top-10 ranking must be stable-ish
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    top_ref = set(np.argsort(-np.asarray(ref)[0])[:10].tolist())
    top_got = set(np.argsort(-np.asarray(got)[0])[:10].tolist())
    assert len(top_ref & top_got) >= 9


def test_pallas_int8_doc_matches_dequantized_oracle(rng):
    """VERDICT r1 #9: per-document-scale layout. The kernel (duplicated
    padding rows, no mask bias, dequant after the max) must match the
    exact oracle run on the dequantized values EXACTLY (same arithmetic,
    different order only)."""
    q, docs, lengths = _make_case(rng, n=64, l=64)
    n, l, d = docs.shape
    qv, dscales = quantize_int8_docs(docs, lengths)
    got = maxsim_scores_int8_doc(q, qv, dscales, lengths, doc_len=l)

    # oracle: dequantize per doc, mask duplicated rows via lengths
    deq = (np.asarray(qv).reshape(n, l, d).astype(np.float32)
           * np.asarray(dscales)[:, None, None])
    ref = maxsim_scores_exact(q, jnp.asarray(deq), lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    # and close to the fp32 truth (coarser than per-row int8, still ~1%)
    truth = maxsim_scores_exact(q, docs, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(truth),
                               rtol=0.08, atol=0.08)
    top_ref = set(np.argsort(-np.asarray(truth)[0])[:10].tolist())
    top_got = set(np.argsort(-np.asarray(got)[0])[:10].tolist())
    assert len(top_ref & top_got) >= 9


def test_int8_doc_duplicated_rows_never_change_max(rng):
    """A doc whose true max sits on its LAST valid token must score the
    same as one padded with duplicates of token 0 (the layout trick)."""
    q, docs, lengths = _make_case(rng, n=8, l=16)
    lengths = jnp.full_like(lengths, 5)   # short docs, lots of padding
    tok = np.arange(16)
    docs = docs * (tok[None, :, None] < 5)
    qv, dscales = quantize_int8_docs(docs, lengths)
    qv3 = np.asarray(qv).reshape(8, 16, -1)
    # layout contract: rows >= length are copies of row 0
    np.testing.assert_array_equal(qv3[:, 5:, :],
                                  np.broadcast_to(qv3[:, 0:1, :],
                                                  qv3[:, 5:, :].shape))
    got = maxsim_scores_int8_doc(q, qv, dscales, lengths, doc_len=16)
    deq = qv3.astype(np.float32) * np.asarray(dscales)[:, None, None]
    ref = maxsim_scores_exact(q, jnp.asarray(deq), lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_zero_length_docs_never_score(rng):
    q, docs, lengths = _make_case(rng, n=16, l=32)
    lengths = lengths.at[3].set(0)
    docs = docs.at[3].set(0.0)
    n, l, d = docs.shape
    got = maxsim_scores(q, docs.reshape(n * l, d), lengths, doc_len=l)
    assert float(got[0, 3]) < -1e20


def test_batched_queries_consistent(rng):
    q, docs, lengths = _make_case(rng, n=32, l=32, b=4)
    n, l, d = docs.shape
    batched = maxsim_scores(q, docs.reshape(n * l, d), lengths, doc_len=l)
    for i in range(4):
        single = maxsim_scores(q[i : i + 1], docs.reshape(n * l, d),
                               lengths, doc_len=l)
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single[0]), rtol=1e-5)
