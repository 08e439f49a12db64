"""Retrieval benchmark — prints ONE JSON line, LAST, for the driver.

Headline metric: p50 end-to-end retrieval latency (query encoding + full
hybrid cascade: BM25 -> pruned MaxSim -> RRF -> exact rerank -> top-10) for
a BATCH of 8 queries over a 100k-chunk int8 token-embedding index on one
chip (BASELINE.json config 4), production config (dense_prefilter=1024,
bm25_postings_cap=512).

The final stdout line is a single JSON object carrying the headline plus
(VERDICT r2 next #1/#3/#4):
  * recall10_vs_exact   — full pruned cascade vs exact fp32 MaxSim;
  * p50_ms_1m           — fused cascade p50 over 1M chunks x 64 tokens
                          (the BASELINE north-star scale, single chip);
  * realdata            — retrieval quality on a REAL markdown corpus
                          (~500 chunks) through the full app pipeline:
                          paraphrase (non-verbatim) and verbatim-ICT
                          hit@10 for the gated/parity/rrf/bm25-only/
                          dense-only configurations, mean +/- spread over
                          3 training seeds, and the measured final-fusion
                          gate decision.
Nothing is printed to stdout after that line (r2's number was lost to
output ordering, BENCH_r02.json parsed=null). All detail goes to stderr.

Timing methodology (IMPORTANT, validated 2026-08-16): on this tunneled
device ``block_until_ready`` returns before device execution completes, so
naive per-call timing under-reports by ~70x. Honest protocol: measure the
scalar-fetch round-trip (RTT), queue N executions back-to-back, force ONE
scalar fetch, report (total - RTT) / N. Cross-checked against a
data-dependency ``lax.scan`` chain (same ms/op) and against device physics
(HBM bytes / bandwidth).

vs_baseline: speedup over the reference's measured 0.321 s *per query*
total retrieval on its own corpus (README.md:182; BASELINE.md) — the
reference's number is 1 query over 287 chunks on an M4; ours is per-query
over 100,000 chunks, so the comparison understates the real gap.

Env kill-switches (each pass is also watchdogged):
  HRAG_BENCH_RECALL=0 | HRAG_BENCH_1M=0 | HRAG_BENCH_REALDATA=0
"""

import hashlib
import json
import os
import shutil
import signal
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

BASELINE_MS = 321.0     # reference total retrieval (README.md:182)
CACHE_VERSION = 5       # bump when training/indexing code changes enough
#                         to invalidate cached trained-encoder params
#                         (v5: round-5 compositional-rewording share)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


class _watchdog:
    """SIGALRM-scoped pass: device->host fetches can hang for minutes on
    the tunneled backend; a stuck pass must not eat the whole bench."""

    def __init__(self, seconds):
        self.seconds = seconds

    def __enter__(self):
        signal.signal(signal.SIGALRM, self._raise)
        signal.alarm(self.seconds)

    @staticmethod
    def _raise(signum, frame):
        raise TimeoutError("pass watchdog")

    def __exit__(self, *exc):
        signal.alarm(0)
        return False


def _make_topic_gen(topics, n_topics, topic_noise, n_pad_g, doc_len_g, dim):
    """Device-side generator of topic-clustered unit-norm int8 token
    embeddings, in blocks (never materializes a multi-GB fp32 temporary —
    the tunneled allocator fragments on those). Cluster structure matters:
    real encoder output is clustered, and the pooled prefilter's recall is
    only meaningful on clustered data."""
    import jax
    import jax.numpy as jnp

    blk = 1024 if n_pad_g % 1024 == 0 else 128  # fp32 temp ~67 MB/step

    @jax.jit
    def gen(key, lens):
        ka, kn = jax.random.split(key)
        assign = jax.random.randint(ka, (n_pad_g,), 0, n_topics)
        keys = jax.random.split(kn, n_pad_g // blk)
        lens2 = lens.reshape(-1, blk)
        base2 = topics[assign].reshape(-1, blk, dim)

        def block(c):
            kb, base, lb = c              # (blk, D), (blk,) per block
            noise = jax.random.normal(kb, (blk, doc_len_g, dim),
                                      jnp.float32) * topic_noise
            x = base[:, None, :] + noise
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
            tokr = jnp.arange(doc_len_g, dtype=jnp.int32)
            x = x * (tokr[None, :] < lb[:, None])[..., None]
            absmax = jnp.max(jnp.abs(x), axis=-1)
            scale = absmax / 127.0
            qv = jnp.round(x / jnp.maximum(scale, 1e-9)[..., None])
            return qv.astype(jnp.int8), scale.astype(jnp.float32)

        qs, scs = jax.lax.map(block, (keys, base2, lens2))
        return (qs.reshape(n_pad_g * doc_len_g, dim),
                scs.reshape(n_pad_g * doc_len_g))
    return gen


def run_headline(result):
    """100k-chunk fused-cascade p50 -> metric/value/unit/vs_baseline.
    Returns context the recall pass reuses."""
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    n_docs = 100_000 if on_tpu else 2_000
    doc_len, dim, batch = 128, 128, 8
    prefilter, postings_cap = 1024, 512
    log(f"backend={backend} devices={jax.devices()} n_docs={n_docs}")

    from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
    from hybrid_rag_colbertv2_tpu.models.colbert import (
        ColBERTConfig, ColBERTEncoder)
    from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
    from hybrid_rag_colbertv2_tpu.ops.prefilter import pooled_doc_embeddings
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import (
        fused_cascade_fn, pack_query_batch)
    from hybrid_rag_colbertv2_tpu.utils.timing import (
        measure_rtt_ms, queued_timeit)

    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    vocab = np.array([f"term{i}" for i in range(5_000)])
    word_idx = rng.integers(0, len(vocab), size=(n_docs, 12))
    corpus = [" ".join(row) for row in vocab[word_idx]]
    log(f"corpus gen: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    lex = LexicalIndex.build(corpus, postings_cap=postings_cap)
    log(f"bm25 build: {time.perf_counter() - t0:.1f}s "
        f"({lex.memory_bytes() / 2**20:.0f} MB, max_post={lex.max_postings})")

    # synthetic int8 index generated DIRECTLY on device: no fp32
    # intermediate (a 6.5 GB fp32 journey both slows the build and leaves
    # the tunneled device's allocator fragmented enough to OOM later
    # stages). Values don't affect the compute graph being timed; the real
    # build path is covered by tests and the app.
    t0 = time.perf_counter()
    n_pad = ((n_docs + 127) // 128) * 128
    lengths = rng.integers(doc_len // 2, doc_len + 1, n_docs).astype(np.int32)
    lengths_pad = np.zeros((n_pad,), np.int32)
    lengths_pad[:n_docs] = lengths

    n_topics, topic_noise = 512, 0.35
    topics = jax.random.normal(jax.random.PRNGKey(42), (n_topics, dim))
    topics = topics / jnp.linalg.norm(topics, axis=-1, keepdims=True)

    def make_gen(n_pad_g, doc_len_g):
        return _make_topic_gen(topics, n_topics, topic_noise,
                               n_pad_g, doc_len_g, dim)

    lens_dev = jnp.asarray(lengths_pad)   # ONE transfer, reused below
    q8, scales = make_gen(n_pad, doc_len)(jax.random.PRNGKey(0), lens_dev)
    pooled = pooled_doc_embeddings(q8, scales, lens_dev, doc_len=doc_len)
    dense = DenseTokenIndex(
        emb_flat=q8, doc_lengths=lens_dev, n_docs=n_docs,
        doc_len=doc_len, dim=dim, scales=scales, pooled=pooled)
    jax.block_until_ready(dense.pooled)
    log(f"dense index gen(int8)+pool: {time.perf_counter() - t0:.1f}s "
        f"({dense.memory_bytes() / 2**30:.2f} GiB)")

    # query encoder (small preset, random init — latency is what we
    # measure; weights don't change the compute graph)
    tok = ColBERTTokenizer.train_bpe(corpus[:2000], vocab_size=8192)
    enc_cfg = ColBERTConfig.small(vocab_size=tok.vocab_size)
    encoder = ColBERTEncoder(enc_cfg, tok, seed=0)

    queries = [" ".join(rng.choice(vocab, size=6)) for _ in range(batch)]
    lex_dev = (jnp.asarray(lex.indptr), jnp.asarray(lex.post_docs),
               jnp.asarray(lex.post_weights))

    # production path: the SAME memoized fused encoder+cascade executable
    # the retrievers use (retrieval/cascade.fused_cascade_fn — one jitted
    # dispatch, one packed transfer), driven directly because the honest-
    # timing protocol cannot use retrieve_batch's per-call device->host
    # fetch
    fused = fused_cascade_fn(encoder.model, enc_cfg.query_max_tokens, dict(
        prefilter=prefilter, n_docs=dense.n_docs,
        max_postings=lex.max_postings, doc_len=dense.doc_len, is_int8=True,
        k_each=100, k_fuse=50, k_final=10))

    from hybrid_rag_colbertv2_tpu.config import RAGConfig
    term_ceiling = RAGConfig.query_max_terms
    term_buckets = RAGConfig.query_term_buckets

    def run_once():
        # host tokenization (BPE + BM25 terms) is part of the serving
        # path; the term width/buckets are the PRODUCTION defaults read
        # from RAGConfig so the benched path cannot drift from the
        # served one
        packed = pack_query_batch(encoder, lex, queries, term_ceiling,
                                  term_buckets)
        return fused(encoder.params, packed, *lex_dev,
                     dense.emb_flat, dense.scales, dense.doc_lengths,
                     dense.pooled, None)[1]

    t0 = time.perf_counter()
    jax.block_until_ready(run_once())  # trigger compiles before timing
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")
    log(f"scalar-fetch rtt: {measure_rtt_ms():.1f}ms")

    iters = 16 if on_tpu else 4
    reps = 5 if on_tpu else 2
    p50, worst = queued_timeit(run_once, iters, reps)
    # iters is a floor: queued_timeit grows the queue until compute
    # dominates the RTT (congested-tunnel guard). Keep a last-resort
    # clamp so a pathological zero can't crash the division below
    # BEFORE the required stdout line.
    p50 = max(p50, 1e-3)
    p50_per_query = p50 / batch
    qps = batch / (p50 / 1e3)
    log(f"batch={batch} p50={p50:.2f}ms worst={worst:.2f}ms"
        f" per-query={p50_per_query:.2f}ms qps/chip={qps:.0f}")

    result.update({
        "metric": f"hybrid retrieval p50 latency (honest queued-dispatch "
                  f"timing), batch={batch} queries, {n_docs} chunks, int8 "
                  f"index, prefilter={prefilter} ({backend})",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / p50_per_query, 1),
    })
    return dict(on_tpu=on_tpu, doc_len=doc_len, dim=dim, batch=batch,
                prefilter=prefilter, postings_cap=postings_cap,
                vocab=vocab, rng=rng, topics=topics, make_gen=make_gen,
                big=(q8, scales, dense, pooled, lex, lex_dev),
                encoder=encoder, corpus=corpus)


def run_recall(result, ctx):
    """recall@10 of the full pruned cascade vs exact fp32 MaxSim on a
    sub-index (VERDICT r1 #4's protocol, now a field of the final JSON)."""
    import jax
    import jax.numpy as jnp

    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
    from hybrid_rag_colbertv2_tpu.ops.maxsim import maxsim_scores_exact
    from hybrid_rag_colbertv2_tpu.ops.prefilter import pooled_doc_embeddings
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import hybrid_cascade

    on_tpu, doc_len, dim = ctx["on_tpu"], ctx["doc_len"], ctx["dim"]
    batch, prefilter = ctx["batch"], ctx["prefilter"]
    rng, vocab, topics = ctx["rng"], ctx["vocab"], ctx["topics"]
    corpus = ctx["corpus"]

    nr = 8192 if on_tpu else 1024
    lens_r = np.zeros((nr,), np.int32)
    lens_r[:nr] = rng.integers(doc_len // 2, doc_len + 1, nr)
    lens_r_dev = jnp.asarray(lens_r)      # ONE transfer, reused

    q8r, scr = ctx["make_gen"](nr, doc_len)(jax.random.PRNGKey(7),
                                            lens_r_dev)
    pooled_r = pooled_doc_embeddings(q8r, scr, lens_r_dev, doc_len=doc_len)
    # the sub-cascade scores nr docs, so its BM25 arm needs a lexical
    # index over the SAME nr-doc sub-corpus — reusing the 100k-doc index
    # would mask ~92% of BM25 candidates (ids >= nr -> -1) and the "full
    # pruned cascade" claim would be dense-only
    lex_r = LexicalIndex.build(corpus[:nr],
                               postings_cap=ctx["postings_cap"])
    lex_r_dev = (jnp.asarray(lex_r.indptr), jnp.asarray(lex_r.post_docs),
                 jnp.asarray(lex_r.post_weights))
    qt_r = jnp.asarray(np.stack([
        lex_r.encode_query(" ".join(rng.choice(vocab, size=6)), 32)
        for _ in range(batch)]))
    # topic-aligned queries (what a trained encoder produces)
    kq1, kq2 = jax.random.split(jax.random.PRNGKey(3))
    qa = jax.random.randint(kq1, (batch,), 0, topics.shape[0])
    qe_r = topics[qa][:, None, :] + 0.3 * jax.random.normal(
        kq2, (batch, 32, dim), jnp.float32)
    qe_r = qe_r / jnp.linalg.norm(qe_r, axis=-1, keepdims=True)
    chunk = 128
    n_chunks_r = nr // chunk

    @jax.jit
    def recall_on_device(q, q_terms_r, lex_ip, lex_pd, lex_pw,
                         emb_flat, scales_r, lens, pooled_arg):
        cascade_ids, _, _ = hybrid_cascade(
            q, q_terms_r, lex_ip, lex_pd, lex_pw,
            emb_flat, scales_r, lens, pooled_arg,
            prefilter=prefilter,
            n_docs=nr, max_postings=lex_r.max_postings,
            doc_len=doc_len, is_int8=True,
            k_each=100, k_fuse=50, k_final=10)
        e4 = emb_flat.reshape(n_chunks_r, chunk, doc_len, dim)
        s4 = scales_r.reshape(n_chunks_r, chunk, doc_len)
        l2 = lens.reshape(n_chunks_r, chunk)

        def f(c):
            docs = c[0].astype(jnp.float32) * c[1][..., None]
            return maxsim_scores_exact(q, docs, c[2])
        parts = jax.lax.map(f, (e4, s4, l2))
        exact = parts.transpose(1, 0, 2).reshape(q.shape[0], -1)
        _, e_top = jax.lax.top_k(exact[:, :nr], 10)
        hits = (cascade_ids[:, :, None] == e_top[:, None, :]).any(-1)
        hits = hits & (cascade_ids >= 0)
        # the exact top-10 comes back too so the int4 variant below can
        # reuse the truth instead of recompiling + rerunning the O(N*L)
        # exact scan (the recall watchdog budget covers ONE such scan)
        return jnp.mean(jnp.sum(hits, axis=1) / 10.0), e_top

    r, e_top10 = recall_on_device(qe_r, qt_r, *lex_r_dev, q8r, scr,
                                  lens_r_dev, pooled_r)
    r = float(r)
    log(f"recall@10 vs exact fp32 MaxSim (pruned int8 cascade, {nr} "
        f"docs): {r:.3f}")
    result["recall10_vs_exact"] = round(r, 3)

    # int4-doc variant (round 4, group scales round 5): SAME fp32 truth
    # (reused from above), nibble-packed 4-bit index (half the HBM /
    # gather bytes — ops/quant.quantize_int4_groups, 8 token rows per
    # scale). Measures what the 4-bit group grid costs in cascade recall
    # on the same corpus.
    from hybrid_rag_colbertv2_tpu.ops.quant import quantize_int4_groups

    @jax.jit
    def recall_int4_on_device(q, q_terms_r, lex_ip, lex_pd, lex_pw,
                              emb_flat, scales_r, lens, e_top):
        embs3 = (emb_flat.astype(jnp.float32)
                 * scales_r[:, None]).reshape(nr, doc_len, dim)
        packed, dsc = quantize_int4_groups(embs3, lens)
        pooled4 = pooled_doc_embeddings(packed, None, lens,
                                        doc_len=doc_len, doc_scales=dsc,
                                        packed_int4=True)
        cascade_ids, _, _ = hybrid_cascade(
            q, q_terms_r, lex_ip, lex_pd, lex_pw,
            packed, None, lens, pooled4, dsc,
            prefilter=prefilter,
            n_docs=nr, max_postings=lex_r.max_postings,
            doc_len=doc_len, is_int8=False,
            k_each=100, k_fuse=50, k_final=10)
        hits = (cascade_ids[:, :, None] == e_top[:, None, :]).any(-1)
        hits = hits & (cascade_ids >= 0)
        return jnp.mean(jnp.sum(hits, axis=1) / 10.0)

    try:
        r4 = float(recall_int4_on_device(qe_r, qt_r, *lex_r_dev, q8r, scr,
                                         lens_r_dev, e_top10))
        log(f"recall@10 vs exact fp32 MaxSim (pruned int4-doc cascade, "
            f"{nr} docs): {r4:.3f}")
        result["recall10_vs_exact_int4"] = round(r4, 3)
    except Exception as e:   # the int4 field must not sink the pass
        log(f"int4 recall skipped: {type(e).__name__}: {e}")


def _scale_fixture(ctx, n_docs, doc_len, tag):
    """Shared harness for the large-scale fused-cascade passes: tiled
    corpus -> lexical index -> device CSR + lengths + query batch.
    Latency at these scales doesn't depend on values, so the corpus is
    the headline base tiled up (same recipe as tools/stage_probe.py)."""
    import jax.numpy as jnp

    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex

    rng, vocab, batch = ctx["rng"], ctx["vocab"], ctx["batch"]
    t0 = time.perf_counter()
    base = ctx["corpus"][:20_000]
    full_corpus = (base * (n_docs // len(base) + 1))[:n_docs]
    lex = LexicalIndex.build(full_corpus,
                             postings_cap=ctx["postings_cap"])
    log(f"{tag} bm25 build: {time.perf_counter() - t0:.1f}s "
        f"max_post={lex.max_postings}")
    n_pad = ((n_docs + 127) // 128) * 128
    lengths = np.zeros((n_pad,), np.int32)
    lengths[:n_docs] = rng.integers(doc_len // 2, doc_len + 1, n_docs)
    return dict(
        tag=tag, n_docs=n_docs, doc_len=doc_len, n_pad=n_pad, lex=lex,
        lex_dev=(jnp.asarray(lex.indptr), jnp.asarray(lex.post_docs),
                 jnp.asarray(lex.post_weights)),
        lens_dev=jnp.asarray(lengths),
        queries=[" ".join(rng.choice(vocab, size=6))
                 for _ in range(batch)],
    )


def _measure_fused(result, ctx, fix, emb, scales, dsc, pooled, *,
                   prefilter, is_int8, result_key, label):
    """Compile + measure ONE fused encoder+cascade executable over the
    fixture's corpus and record p50 under ``result_key``."""
    import jax

    from hybrid_rag_colbertv2_tpu.config import RAGConfig
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import (
        fused_cascade_fn, pack_query_batch)
    from hybrid_rag_colbertv2_tpu.utils.timing import queued_timeit

    encoder, batch = ctx["encoder"], ctx["batch"]
    lex = fix["lex"]
    fused = fused_cascade_fn(encoder.model, encoder.cfg.query_max_tokens,
                             dict(prefilter=prefilter,
                                  n_docs=fix["n_docs"],
                                  max_postings=lex.max_postings,
                                  doc_len=fix["doc_len"],
                                  is_int8=is_int8,
                                  k_each=100, k_fuse=50, k_final=10))

    def run_once():
        # production-default term width/buckets, read from RAGConfig
        packed = pack_query_batch(encoder, lex, fix["queries"],
                                  RAGConfig.query_max_terms,
                                  RAGConfig.query_term_buckets)
        return fused(encoder.params, packed, *fix["lex_dev"],
                     emb, scales, fix["lens_dev"], pooled, dsc)[1]

    t0 = time.perf_counter()
    jax.block_until_ready(run_once())
    log(f"{label} compile+first run: {time.perf_counter() - t0:.1f}s")
    iters = 16 if ctx["on_tpu"] else 2
    reps = 5 if ctx["on_tpu"] else 2
    p50, worst = queued_timeit(run_once, iters, reps)
    p50 = max(p50, 1e-3)
    log(f"{label} fused cascade: p50={p50:.2f}ms worst={worst:.2f}ms "
        f"batch={batch} ({p50 / batch:.2f} ms/query)")
    result[result_key] = round(p50, 3)
    return p50


def _gen_packed_int4(fix, dim):
    """Fresh nibble-packed pair-row index (n_pad * L/2, D) + per-token-
    GROUP scales in the (G, n_pad) doc-axis-minor layout
    (ops/quant.quantize_int4_groups). Plain randint fuses the threefry
    into the int8 consumer; a bits+bitcast+reshape chain materializes
    ~4x the output in u32 temps (measured compile-reported OOM at
    1M x 64)."""
    import jax
    import jax.numpy as jnp

    from hybrid_rag_colbertv2_tpu.ops.quant import int4_group_size

    n_pad, doc_len = fix["n_pad"], fix["doc_len"]
    ng = doc_len // int4_group_size(doc_len)

    @jax.jit
    def gen(key, lens):
        k1, k2 = jax.random.split(key)
        rows = n_pad * doc_len // 2
        packed = jax.random.randint(k1, (rows, dim), -127, 128, jnp.int8)
        dsc = (0.9 + 0.2 * jax.random.uniform(k2, (ng, n_pad))) / (
            7.0 * np.sqrt(dim))
        return packed, jnp.where(lens[None, :] > 0, dsc, 0.0)

    return gen(jax.random.PRNGKey(1), fix["lens_dev"])


def run_1m(result, ctx):
    """Fused-cascade p50 over 1M chunks x 64 tokens on ONE chip — the
    BASELINE.json config-5 / north-star scale, previously only in
    docs/performance.md (VERDICT r2 next #4) — then the same scale on
    the half-HBM nibble-packed int4-doc layout. Uniform-random index
    (latency doesn't depend on values); int4 recall rides separately in
    recall10_vs_exact_int4."""
    import jax
    import jax.numpy as jnp

    from hybrid_rag_colbertv2_tpu.ops.prefilter import pooled_doc_embeddings

    on_tpu, dim, batch = ctx["on_tpu"], ctx["dim"], ctx["batch"]
    n_docs = 1_000_000 if on_tpu else 10_000
    doc_len, prefilter = 64, 2048
    fix = _scale_fixture(ctx, n_docs, doc_len, "1M")
    n_pad = fix["n_pad"]

    @jax.jit
    def gen_index(key, lens):
        k1, k2 = jax.random.split(key)
        q8 = jax.random.randint(k1, (n_pad * doc_len, dim), -127, 128,
                                jnp.int8)
        sc = (0.9 + 0.2 * jax.random.uniform(k2, (n_pad * doc_len,))) / (
            127.0 * np.sqrt(dim))
        tok = jnp.arange(doc_len, dtype=jnp.int32)
        valid = (tok[None, :] < lens[:, None]).reshape(-1)
        return q8, jnp.where(valid, sc, 0.0)

    t0 = time.perf_counter()
    q8, scales = gen_index(jax.random.PRNGKey(0), fix["lens_dev"])
    pooled = pooled_doc_embeddings(q8, scales, fix["lens_dev"],
                                   doc_len=doc_len)
    jax.block_until_ready(pooled)
    log(f"1M index gen+pool: {time.perf_counter() - t0:.1f}s "
        f"({q8.size / 2**30:.2f} GiB int8)")

    p50 = _measure_fused(result, ctx, fix, q8, scales, None, pooled,
                         prefilter=prefilter, is_int8=True,
                         result_key="p50_ms_1m", label="1M")
    result["vs_baseline_1m"] = round(BASELINE_MS / (p50 / batch), 1)

    # nibble-packed int4-doc at the same 1M scale (round 4): HALF the
    # index HBM (3.8 vs 7.6 GiB) and half the stage-B gather bytes. Free
    # the int8 index FIRST (12 GiB of simultaneous indexes OOMs a 16 GiB
    # chip — measured); `pooled` is layout-independent (N, D) bf16 and
    # is reused as-is.
    try:
        q8.delete()
        scales.delete()
        q4, dsc = _gen_packed_int4(fix, dim)
        jax.block_until_ready(q4)
        p50_4 = _measure_fused(result, ctx, fix, q4, None, dsc, pooled,
                               prefilter=prefilter, is_int8=False,
                               result_key="p50_ms_1m_int4",
                               label="1M int4")
        result["qps_chip_1m_int4"] = round(batch / (p50_4 / 1e3), 1)
        _throughput_fields(result, ctx, fix, q4, dsc)
    except Exception as e:      # the int4 field must not sink the pass
        log(f"1M int4 leg skipped: {type(e).__name__}: {e}")


def _throughput_fields(result, ctx, fix, q4, dsc):
    """VERDICT r4 #9: machine-visible perf fields so regressions across
    rounds are diffable in BENCH_r{N}.json, not prose. Two primitives
    bracket the system: (a) the raw full-corpus int4 MaxSim scan (the
    bandwidth-bound primitive the pruned cascade replaces — its GB/s is
    the HBM story, its TFLOPS the MXU story), (b) the query-encoder
    forward (the compute-bound primitive), with FLOPs taken from XLA's
    own cost analysis of the compiled executable."""
    import jax

    from hybrid_rag_colbertv2_tpu.ops.maxsim import maxsim_scores_int4_doc
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import pack_query_batch
    from hybrid_rag_colbertv2_tpu.utils.timing import queued_timeit

    encoder, batch = ctx["encoder"], ctx["batch"]
    doc_len, n_pad = fix["doc_len"], fix["n_pad"]
    dim = ctx["dim"]
    lq = encoder.cfg.query_max_tokens
    q_emb = jax.block_until_ready(
        encoder.encode_queries(fix["queries"]))       # (B, Lq, D)

    def scan_once():
        return maxsim_scores_int4_doc(q_emb, q4, dsc, fix["lens_dev"],
                                      doc_len=doc_len)

    jax.block_until_ready(scan_once())
    iters = 8 if ctx["on_tpu"] else 2
    p50s, _ = queued_timeit(scan_once, iters, 3)
    # the pair-row trick runs the same MACs as an unpacked scan:
    # 2 * B * N * L * D * Lq
    flops = 2.0 * batch * n_pad * doc_len * dim * lq
    gb = (q4.size + dsc.size * 4) / 1e9
    result["scan_p50_ms_1m_int4"] = round(p50s, 3)
    result["scan_tflops_1m_int4"] = round(flops / (p50s / 1e3) / 1e12, 1)
    result["scan_gbps_1m_int4"] = round(gb / (p50s / 1e3), 1)
    log(f"1M int4 full scan: p50={p50s:.2f}ms "
        f"{result['scan_tflops_1m_int4']} TFLOPS "
        f"{result['scan_gbps_1m_int4']} GB/s")

    # encoder forward: FLOPs from XLA cost analysis of the jitted fwd
    model, params = encoder.model, encoder.params
    packed = pack_query_batch(encoder, fix["lex"], fix["queries"])
    q_ids = packed[:, :lq]

    fwd = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, jax.numpy.ones_like(x)))

    def enc_once():
        # measure the JITTED forward — an eager model.apply dispatches
        # every op separately through the tunnel (measured 550 ms for a
        # 3 ms graph)
        return fwd(params, q_ids)
    try:
        cost = fwd.lower(params, q_ids).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):   # older jax: one dict/device
            cost = cost[0] if cost else {}
        enc_flops = float(cost.get("flops", 0.0))
    except Exception:
        enc_flops = 0.0
    jax.block_until_ready(enc_once())
    p50e, _ = queued_timeit(enc_once, iters, 3)
    result["encoder_p50_ms_b8"] = round(p50e, 3)
    if enc_flops > 0:
        result["encoder_tflops"] = round(
            enc_flops / (p50e / 1e3) / 1e12, 1)
    log(f"encoder fwd (B={batch}): p50={p50e:.2f}ms "
        f"~{result.get('encoder_tflops', 'n/a')} TFLOPS "
        f"(xla flops={enc_flops:.3g})")


def run_2m_int4(result, ctx):
    """Fused-cascade p50 over TWO MILLION chunks x 64 tokens on ONE chip
    — the capacity headline the nibble-packed int4-doc layout exists
    for: 7.6 GiB packed (the int8 index of the same corpus would be
    15.3 GiB and OOM a 16 GiB device alongside its transients)."""
    import jax

    from hybrid_rag_colbertv2_tpu.ops.prefilter import pooled_doc_embeddings

    if not ctx["on_tpu"]:
        log("2M pass: CPU backend — skipping (TPU-scale capacity demo)")
        return
    dim, batch = ctx["dim"], ctx["batch"]
    fix = _scale_fixture(ctx, 2_000_000, 64, "2M")

    t0 = time.perf_counter()
    q4, dsc = _gen_packed_int4(fix, dim)
    pooled = pooled_doc_embeddings(q4, None, fix["lens_dev"], doc_len=64,
                                   doc_scales=dsc, packed_int4=True)
    jax.block_until_ready(pooled)
    log(f"2M index gen+pool: {time.perf_counter() - t0:.1f}s "
        f"({q4.size / 2**30:.2f} GiB int4 packed)")

    p50 = _measure_fused(result, ctx, fix, q4, None, dsc, pooled,
                         prefilter=2048, is_int8=False,
                         result_key="p50_ms_2m_int4", label="2M int4")
    result["vs_baseline_2m"] = round(BASELINE_MS / (p50 / batch), 1)


def _seed_eval(td, n_docs, steps, seed, prefilter, postings_cap,
               cache_root):
    """One training seed of the REAL-DATA pass: corpus -> full app
    pipeline (chunk -> store -> ICT-train w/ BM25-mined hard negatives ->
    dual index) -> measured fusion gate -> paraphrase + verbatim-ICT
    evals. Trained encoder params+tokenizer are cached on disk keyed by
    (corpus, train config, seed) so warm driver runs skip training
    (VERDICT r2 next #9)."""
    from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
    from hybrid_rag_colbertv2_tpu.config import RAGConfig
    from hybrid_rag_colbertv2_tpu.tools.eval_recall import evaluate
    from hybrid_rag_colbertv2_tpu.tools.sample_corpus import write_corpus

    paths = write_corpus(f"{td}/docs", n_docs=n_docs, seed=0)
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(p.read_bytes())
    cfg = RAGConfig(
        db_path=f"{td}/rag.db",
        bm25_index_path=f"{td}/idx/bm25",
        colbert_index_path=f"{td}/idx/colbert",
        tokenizer_path=f"{td}/idx/tok.json",
        images_dir=f"{td}/img",
        min_chunk_size=48, max_chunk_size=96,
        doc_max_tokens=128,
        encoder_train_steps=steps,
        encoder_seed=seed,
        dense_prefilter=prefilter,
        bm25_postings_cap=postings_cap,
    )
    h.update(f"|{steps}|{seed}|{cfg.encoder_preset}|"
             f"{cfg.encoder_hard_negatives}|{cfg.tokenizer_vocab_size}|"
             f"{cfg.encoder_word_dropout}|{cfg.encoder_max_epochs}|"
             f"{cfg.encoder_synonym_prob}|{cfg.encoder_synonym_pairs}|"
             f"{cfg.encoder_tie_weight}|{cfg.encoder_reworded_pairs}|"
             f"{cfg.encoder_lexical_anchor}|"
             f"{CACHE_VERSION}".encode())
    cdir = cache_root / h.hexdigest()[:16]
    c_params, c_tok = cdir / "encoder_params.npz", cdir / "tokenizer.json"
    warm = c_params.exists() and c_tok.exists()
    if warm:
        log(f"seed {seed}: cached encoder {cdir.name} (skipping training)")
        Path(cfg.tokenizer_path).parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(c_tok, cfg.tokenizer_path)
        enc_dir = Path(cfg.colbert_index_path)
        enc_dir.mkdir(parents=True, exist_ok=True)
        shutil.copy(c_params, enc_dir / "encoder_params.npz")
        cfg.encoder_train_steps = 0
    t0 = time.perf_counter()
    app = RAGApplication(cfg, use_ollama=False)
    app.index_documents([str(p) for p in paths])
    if not warm:
        cdir.mkdir(parents=True, exist_ok=True)
        shutil.copy(Path(cfg.colbert_index_path) / "encoder_params.npz",
                    c_params)
        shutil.copy(cfg.tokenizer_path, c_tok)
    app.resolve_final_fusion()
    log(f"seed {seed}: indexed+trained in {time.perf_counter() - t0:.0f}s, "
        f"gate={app.fusion_gate}")

    out = {"gate": app.fusion_gate, "chunks": None}
    # gate TRANSFER check (VERDICT r3 next #7): the gate calibrates on
    # ICT-span queries; validate the picked entry on the generator-
    # DISJOINT template family (paraphrase + adversarial pairs) — the
    # verdict must be a property of the index, not of the generator.
    try:
        from hybrid_rag_colbertv2_tpu.retrieval.gate import \
            validate_transfer
        from hybrid_rag_colbertv2_tpu.tools.eval_recall import (
            adversarial_eval_pairs, paraphrase_eval_pairs)

        corpus = app.store.all_chunk_texts()
        fam = paraphrase_eval_pairs(corpus) + adversarial_eval_pairs(corpus)
        rng = np.random.default_rng(31)
        rng.shuffle(fam)
        picked = (app.config.final_fusion, app.config.fusion_weight_bm25)
        out["gate_transfer"] = validate_transfer(
            app.config, app.indexes, app.encoder, fam[:96], picked,
            chunk_store=app.store)
        log(f"seed {seed} gate transfer: {json.dumps(out['gate_transfer'])}")
    except Exception as e:       # transfer check must never sink the pass
        log(f"seed {seed} gate transfer skipped: {type(e).__name__}: {e}")
    # "gated" = whatever (final_fusion, fusion_weight_bm25) the measured
    # gate calibrated; "parity" = the reference's settings; "rrf" = the
    # equal-weight blended final ordering
    configs = {
        "gated": None,
        "parity": {"final_fusion": "rerank", "fusion_weight_bm25": 0.5},
        "rrf": {"final_fusion": "rrf", "fusion_weight_bm25": 0.5},
    }
    for source in ("paraphrase", "ict", "adversarial"):
        per = {}
        for name, overrides in configs.items():
            # the exact-cascade comparison and per-leg diagnostics are
            # index/encoder properties — measure them ONCE per source (on
            # the gated config); re-measuring per config costs an extra
            # fused-cascade compile each through the tunnel
            r = evaluate(app, n_queries=128, k=10, batch=8,
                         measure_latency=False, query_source=source,
                         config_overrides=overrides,
                         measure_exact=(name == "gated"),
                         measure_legs=(name == "gated"))
            per[name] = r
            log(f"seed {seed} {source} {name}: {json.dumps(r)}")
        conf = per["gated"]
        out["chunks"] = conf["chunks"]
        out[source] = {
            "hit10": conf["hit@10_configured"],          # calibrated
            "hit10_parity": per["parity"]["hit@10_configured"],
            "hit10_rrf": per["rrf"]["hit@10_configured"],
            "hit10_bm25_only": conf["hit@10_bm25_only"],
            "hit10_dense_only": conf["hit@10_dense_only"],
            "agreement10_vs_exact": conf["agreement@10"],
            "queries": conf["queries"],
        }
    return out


def run_realdata(result, ctx):
    """REAL-DATA quality (VERDICT r2 next #2/#3): ~500-chunk natural-
    English markdown corpus through the FULL app pipeline, 3 training
    seeds, paraphrase (headline) + verbatim-ICT evals, measured
    final-fusion gate. Aggregates mean and max-min spread across seeds."""
    on_tpu = ctx["on_tpu"]
    n_docs = 112 if on_tpu else 12
    # 1800 steps ≈ 4 epochs over 14 pairs/chunk (6 base + 8 synonym-
    # augmented, the config default) at 491 chunks / batch 16; tokenized
    # batches are cached (trainer), so steps beyond the first epoch are
    # ~0.1 s each. Measured on the r4 sweep: 600 steps left dense-only
    # adversarial at 0.17; 1800 with synonym-tied init + 4 augmented
    # pairs reached 0.44; 8 augmented pairs (default since 2026-08-18)
    # reached 0.57 and moved the measured gate to (rrf, 0.5).
    steps = 1800 if on_tpu else 8
    seeds = (0, 1, 2) if on_tpu else (0,)
    cache_root = Path(__file__).resolve().parent / ".bench_cache"
    cache_root.mkdir(exist_ok=True)

    per_seed = []
    for i, seed in enumerate(seeds):
        # first seed pays the compiles — up to ~8 min under tunnel
        # contention (observed); later seeds reuse every executable.
        # Budgets cover train(1800 steps ~6-7 min) + gate + transfer + 9
        # evals over 3 sources (r4 added the adversarial slice); warm
        # runs (cached encoder) take ~3 min/seed.
        budget = 1800 if i == 0 else 1080
        try:
            with _watchdog(budget):
                with tempfile.TemporaryDirectory() as td:
                    per_seed.append(_seed_eval(
                        td, n_docs, steps, seed, ctx["prefilter"],
                        ctx["postings_cap"], cache_root))
        except Exception as e:
            log(f"realdata seed {seed} skipped: {type(e).__name__}: {e}")
    if not per_seed:
        return

    rd = {"chunks": per_seed[0]["chunks"], "seeds": len(per_seed),
          "train_steps": steps, "gate": per_seed[0]["gate"]}
    transfers = [s["gate_transfer"] for s in per_seed
                 if "gate_transfer" in s]
    if transfers:
        rd["gate_transfer"] = {
            "transfer_hit@10": round(float(np.mean(
                [t["transfer_hit@10"] for t in transfers])), 3),
            "transfer_best": round(float(np.mean(
                [t["transfer_best"] for t in transfers])), 3),
            "in_band_all_seeds": all(t["in_band"] for t in transfers),
            "per_entry": transfers[0]["per_entry"],
        }
    for source in ("paraphrase", "ict", "adversarial"):
        rows = [s[source] for s in per_seed if source in s]
        if not rows:
            continue
        agg = {}
        for key in rows[0]:
            vals = [r[key] for r in rows]
            if isinstance(vals[0], (int, float)):
                agg[key] = round(float(np.mean(vals)), 3)
                if len(vals) > 1 and key.startswith("hit10"):
                    agg[f"{key}_spread"] = round(
                        float(np.max(vals) - np.min(vals)), 3)
            else:
                agg[key] = vals[0]
        rd[source] = agg
    result["realdata"] = rd
    # the headline quality claim: gated hybrid vs its own BM25 leg on
    # non-verbatim queries (VERDICT r2 next #2 done-condition)
    if "paraphrase" in rd:
        result["hit10_paraphrase"] = rd["paraphrase"]["hit10"]
        result["hit10_paraphrase_bm25_only"] = \
            rd["paraphrase"]["hit10_bm25_only"]
    slices = [s for s in ("paraphrase", "ict", "adversarial") if s in rd]
    if len(slices) >= 2:
        deltas = {s: round(rd[s]["hit10"] - rd[s]["hit10_bm25_only"], 3)
                  for s in slices}
        result["hit10_mean_all"] = round(
            float(np.mean([rd[s]["hit10"] for s in slices])), 3)
        result["hit10_mean_all_bm25_only"] = round(
            float(np.mean([rd[s]["hit10_bm25_only"] for s in slices])), 3)
        # kept for cross-round comparability with BENCH_r03
        if "paraphrase" in rd and "ict" in rd:
            result["hit10_mean_both"] = round(
                (rd["paraphrase"]["hit10"] + rd["ict"]["hit10"]) / 2, 3)
            result["hit10_mean_both_bm25_only"] = round(
                (rd["paraphrase"]["hit10_bm25_only"]
                 + rd["ict"]["hit10_bm25_only"]) / 2, 3)
        if "adversarial" in rd:
            result["hit10_adversarial_dense_only"] = \
                rd["adversarial"]["hit10_dense_only"]
        mean_delta = round(float(np.mean(list(deltas.values()))), 3)
        result["quality_note"] = (
            "calibrated hybrid minus bm25-only: "
            + ", ".join(f"{s} {deltas[s]:+.3f}" for s in slices)
            + f", mean {mean_delta:+.3f} over {len(slices)} slices "
            "(paraphrase keeps concrete slot words = BM25's best case; "
            "adversarial replaces them via the synonym lexicon = only "
            "semantics works). The (final_fusion, bm25 leg weight) "
            "setting is measured per index on held-out queries "
            "(retrieval/gate.py); parity (rerank, unweighted) scores "
            + "/".join(str(rd[s]["hit10_parity"]) for s in slices)
            + " on the same evals.")


def run_pretrained(result, ctx):
    """PRETRAINED-checkpoint quality (VERDICT r4 missing #1): this
    container is offline, so the jina-colbert-v2 quality number cannot
    be produced here — but the first person with network access gets it
    for free:

        huggingface-cli download jinaai/jina-colbert-v2 --local-dir ckpt
        HRAG_CHECKPOINT=ckpt python bench.py

    re-runs the three realdata slices (paraphrase / ict / adversarial)
    with the converted checkpoint (no self-training) and emits
    ``pretrained_*`` fields next to the self-trained ones. Skipped with
    a log line when HRAG_CHECKPOINT is unset/invalid."""
    ckpt = os.environ.get("HRAG_CHECKPOINT", "")
    if not ckpt:
        log("pretrained pass skipped: HRAG_CHECKPOINT not set "
            "(offline container — see docstring for the one-command "
            "recipe once a checkpoint is available)")
        return
    if not Path(ckpt).is_dir():
        log(f"pretrained pass skipped: HRAG_CHECKPOINT={ckpt} is not a "
            "directory")
        return
    from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
    from hybrid_rag_colbertv2_tpu.config import RAGConfig
    from hybrid_rag_colbertv2_tpu.tools.eval_recall import evaluate
    from hybrid_rag_colbertv2_tpu.tools.sample_corpus import write_corpus

    n_docs = 112 if ctx["on_tpu"] else 12
    with tempfile.TemporaryDirectory() as td:
        paths = write_corpus(f"{td}/docs", n_docs=n_docs, seed=0)
        cfg = RAGConfig(
            db_path=f"{td}/rag.db",
            bm25_index_path=f"{td}/idx/bm25",
            colbert_index_path=f"{td}/idx/colbert",
            tokenizer_path=f"{td}/idx/tok.json",
            images_dir=f"{td}/img",
            min_chunk_size=48, max_chunk_size=96,
            doc_max_tokens=128,
            encoder_checkpoint=ckpt,
            encoder_train_steps=0,
            dense_prefilter=ctx["prefilter"],
            bm25_postings_cap=ctx["postings_cap"],
        )
        t0 = time.perf_counter()
        app = RAGApplication(cfg, use_ollama=False)
        app.index_documents([str(p) for p in paths])
        app.resolve_final_fusion()
        log(f"pretrained: indexed in {time.perf_counter() - t0:.0f}s, "
            f"gate={app.fusion_gate}")
        pre = {"gate": app.fusion_gate}
        n_eval = 128 if ctx["on_tpu"] else 16
        for source in ("paraphrase", "ict", "adversarial"):
            r = evaluate(app, n_queries=n_eval, k=10, batch=8,
                         measure_latency=False, query_source=source,
                         measure_exact=False, measure_legs=True)
            pre[source] = {"hit10": r["hit@10_configured"],
                           "hit10_bm25_only": r["hit@10_bm25_only"],
                           "hit10_dense_only": r["hit@10_dense_only"]}
            log(f"pretrained {source}: {json.dumps(pre[source])}")
        result["pretrained"] = pre
        result["hit10_mean_pretrained"] = round(float(np.mean(
            [pre[s]["hit10"] for s in
             ("paraphrase", "ict", "adversarial")])), 3)


def run_organic(result, ctx):
    """ORGANIC-corpus quality: the repo's own documentation (genuine
    technical prose, not template-generated) through the DEFAULT config
    (auto-train, auto gate). Guards the quality claim against "the
    corpus generator flatters the system" — and it earns its keep: this
    measurement caught the round-4 gate parity-priority bug
    (docs/performance.md, 'organic corpus' section). Slices: verbatim
    ICT spans, 30% word-dropout, full synonym substitution (the
    template paraphrase/adversarial slices don't exist off the sample
    corpus; these three are corpus-agnostic)."""
    from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
    from hybrid_rag_colbertv2_tpu.config import RAGConfig
    from hybrid_rag_colbertv2_tpu.retrieval.gate import measure_menu
    from hybrid_rag_colbertv2_tpu.tools.eval_recall import evaluate
    from hybrid_rag_colbertv2_tpu.train.data import pseudo_query_pairs

    root = Path(__file__).resolve().parent
    docs = [p for p in (
        root / "README.md", root / "SURVEY.md", root / "PARITY.md",
        root / "BASELINE.md", root / "docs" / "architecture.md",
        root / "docs" / "performance.md", root / "docs" / "scaling.md",
    ) if p.exists()]
    if len(docs) < 3:
        log("organic pass skipped: repo docs not found")
        return
    with tempfile.TemporaryDirectory() as td:
        cfg = RAGConfig(
            db_path=f"{td}/rag.db", bm25_index_path=f"{td}/idx/bm25",
            colbert_index_path=f"{td}/idx/colbert",
            tokenizer_path=f"{td}/idx/tok.json", images_dir=f"{td}/img",
            min_chunk_size=48, max_chunk_size=96, doc_max_tokens=192,
        )
        t0 = time.perf_counter()
        app = RAGApplication(cfg, use_ollama=False)
        app.index_documents([str(p) for p in docs])
        app.resolve_final_fusion()
        corpus = app.store.all_chunk_texts()
        log(f"organic: {len(corpus)} chunks indexed+gated in "
            f"{time.perf_counter() - t0:.0f}s, gate="
            f"({app.config.final_fusion}, w={app.config.fusion_weight_bm25})")
        org = {"chunks": len(corpus),
               "gate_picked": app.config.final_fusion,
               "gate_weight": app.config.fusion_weight_bm25}
        n_eval = 96 if ctx["on_tpu"] else 16
        r = evaluate(app, n_queries=n_eval, k=10, batch=8,
                     measure_latency=False, query_source="ict",
                     measure_exact=False, measure_legs=True)
        org["ict"] = {"hit10": r["hit@10_configured"],
                      "hit10_bm25_only": r["hit@10_bm25_only"],
                      "hit10_dense_only": r["hit@10_dense_only"]}
        log(f"organic ict: {json.dumps(org['ict'])}")
        picked = (app.config.final_fusion, app.config.fusion_weight_bm25)
        lex = app.indexes.lexical
        for name, kw in (("dropout", dict(word_dropout=0.3, seed=211)),
                         ("synonym", dict(synonym_prob=1.0, seed=313))):
            pairs = pseudo_query_pairs(corpus, n_pairs_per_doc=1, **kw)
            rng = np.random.default_rng(kw["seed"])
            rng.shuffle(pairs)
            pairs = pairs[:n_eval]
            queries = [q for q, _ in pairs]
            sources = np.array([i for _, i in pairs])
            hits = measure_menu(app.config, app.indexes, app.encoder,
                                [picked], queries, sources,
                                chunk_store=app.store)
            bm = np.stack([np.argsort(-lex.score_host(q))[:10]
                           for q in queries])
            bm_hit = float(np.mean([sources[i] in set(bm[i].tolist())
                                    for i in range(len(pairs))]))
            org[name] = {"hit10": round(float(hits[tuple(picked)]), 3),
                         "hit10_bm25_only": round(bm_hit, 3)}
            log(f"organic {name}: {json.dumps(org[name])}")
        slices = ("ict", "dropout", "synonym")
        org["hit10_mean"] = round(float(np.mean(
            [org[s]["hit10"] for s in slices])), 3)
        org["hit10_mean_bm25_only"] = round(float(np.mean(
            [org[s]["hit10_bm25_only"] for s in slices])), 3)
        # generator-DISJOINT slice (VERDICT r4 next #3): ~40 hand-written
        # natural questions with keyphrase-anchored gold chunks — the
        # template slices above sample their vocabulary from the gold
        # chunk (BM25's best case, saturates 0.85-0.95); these do not.
        from hybrid_rag_colbertv2_tpu.tools.organic_questions import (
            evaluate_questions)
        nat = evaluate_questions(app, k=10)
        org["questions"] = nat
        log(f"organic hand-written questions: {json.dumps(nat)}")
        if nat.get("n"):
            result["organic_q_hit10"] = nat["hit10"]
            result["organic_q_bm25_only"] = nat["hit10_bm25_only"]
        # truncation cost (VERDICT r4 next #6): the dense index scores
        # only the first doc_max_tokens of a chunk. Re-encode this
        # corpus at doc_len=64 and measure the dense-only ICT hit@10
        # drop vs the full-length (192) index — ICT spans sample the
        # WHOLE chunk, so prefix truncation shows up directly.
        try:
            from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
            embs64, lens64 = app.encoder.encode_docs(corpus, doc_len=64)
            idx64 = DenseTokenIndex.build(embs64, lens64, doc_len=64,
                                          dtype="int8")
            pairs = pseudo_query_pairs(corpus, n_pairs_per_doc=1, seed=97)
            rng = np.random.default_rng(97)
            rng.shuffle(pairs)
            pairs = pairs[:n_eval]
            qs = [q for q, _ in pairs]
            srcs = np.array([i for _, i in pairs])
            full_dense = app.indexes.dense

            def dense_hit(idx):
                hits = []
                for i0 in range(0, len(qs), 8):
                    qe = app.encoder.encode_queries(qs[i0:i0 + 8])
                    _, di = idx.search_topk(qe, 10)
                    di = np.asarray(di)
                    for j in range(di.shape[0]):
                        hits.append(srcs[i0 + j] in set(di[j].tolist()))
                return round(float(np.mean(hits)), 3)

            trunc = {"dense_hit10_full": dense_hit(full_dense),
                     "dense_hit10_len64": dense_hit(idx64),
                     "pct_docs_truncated_at_64": round(float(np.mean(
                         np.asarray(lens64) >= 64)), 3)}
            trunc["delta"] = round(
                trunc["dense_hit10_len64"] - trunc["dense_hit10_full"], 3)
            org["truncation"] = trunc
            result["trunc64_dense_delta"] = trunc["delta"]
            log(f"organic truncation probe: {json.dumps(trunc)}")
        except Exception as e:
            log(f"truncation probe skipped: {type(e).__name__}: {e}")
        result["organic"] = org


def main():
    import threading

    result = {}
    # fail FAST (clear error, nonzero rc) instead of hanging the driver
    # forever if the tunneled device wedges mid-headline (observed: a
    # ~40-min period where even tiny matmuls never returned). A SIGALRM
    # watchdog cannot interrupt a thread blocked inside one C++ device
    # call, so use a daemon timer that hard-exits the process — the only
    # mechanism that is guaranteed to fire during a true wedge.
    def _die():
        log("headline watchdog: device wedged for 2400 s — aborting")
        os._exit(3)

    killer = threading.Timer(2400, _die)
    killer.daemon = True
    killer.start()
    ctx = run_headline(result)   # must succeed — carries contract keys
    killer.cancel()

    # realdata has NO outer watchdog: its per-seed watchdogs would clash
    # with a nested alarm (signal.alarm is process-global)
    passes = [
        ("HRAG_BENCH_RECALL", 150, run_recall, "recall"),
        ("HRAG_BENCH_1M", 660, run_1m, "1M"),
        ("HRAG_BENCH_2M", 600, run_2m_int4, "2M-int4"),
        ("HRAG_BENCH_REALDATA", None, run_realdata, "realdata"),
        ("HRAG_BENCH_PRETRAINED", None, run_pretrained, "pretrained"),
        ("HRAG_BENCH_ORGANIC", 1500, run_organic, "organic"),
    ]
    try:
        for env, budget, fn, name in passes:
            if os.environ.get(env, "1") == "0":
                log(f"{name} pass disabled via {env}=0")
                continue
            if name in ("1M", "2M-int4", "realdata") and "big" in ctx:
                # release the 100k headline index before big allocations
                ctx.pop("big", None)
                import gc
                gc.collect()
            try:
                if budget is None:
                    fn(result, ctx)
                else:
                    with _watchdog(budget):
                        fn(result, ctx)
            except Exception as e:
                log(f"{name} pass skipped: {type(e).__name__}: {e}")
    finally:
        # THE contract: exactly one JSON line, LAST on stdout
        sys.stderr.flush()
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
