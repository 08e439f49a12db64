"""Per-stage retrieval latency probe (observability tool).

Times each stage of the hybrid cascade in isolation and end-to-end, brute
vs pruned dense search, on whatever backend JAX resolves (TPU or CPU). The
reference prints per-stage wall-clock inside retrieve()
(local_rag_complete.py:901-933); this is the structured equivalent plus
kernel-level isolation, for answering "where does the time go".

Usage:
  python -m hybrid_rag_colbertv2_tpu.tools.stage_probe \
      [--n-docs 100000] [--doc-len 128] [--batch 8] [--prefilter 1024] \
      [--iters 20] [--skip-brute]

Prints one JSON object per measurement line to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# Timing protocol lives in utils/timing.py (shared with bench.py): queue N
# executions, one scalar fetch, subtract the measured RTT.
from hybrid_rag_colbertv2_tpu.utils.timing import (  # noqa: E402
    measure_rtt_ms,
    queued_timeit as _timeit,
)


def probe_flagship(args) -> int:
    """Instantiate the full jina-colbert-v2 geometry (24L/1024H, 560M
    params — the encoder the reference loads, local_rag_complete.py:718-724)
    with random weights and measure query-encode latency, corpus-encode
    throughput, and HBM footprint on the current backend."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hybrid_rag_colbertv2_tpu.models.colbert import (
        ColBERTConfig, ColBERTModel)

    backend = jax.default_backend()
    cfg = ColBERTConfig.jina_colbert_v2(dtype=jnp.dtype(args.encoder_dtype))
    model = ColBERTModel(cfg)
    log(f"flagship: {cfg.num_layers}L H={cfg.hidden_size} vocab="
        f"{cfg.vocab_size} act-dtype={args.encoder_dtype} backend={backend}")

    t0 = time.perf_counter()
    init = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )["params"])
    params = init(jax.random.PRNGKey(0))
    leaves = jax.tree_util.tree_leaves(params)
    jax.block_until_ready(leaves[0])
    n_params = sum(x.size for x in leaves)
    param_bytes = sum(x.size * x.dtype.itemsize for x in leaves)
    log(f"init: {time.perf_counter() - t0:.1f}s  params={n_params / 1e6:.0f}M"
        f" ({param_bytes / 2**30:.2f} GiB)")

    apply = jax.jit(lambda p, ids, mask: model.apply(
        {"params": p}, ids, mask))
    rng = np.random.default_rng(0)

    def mem_mb():
        try:
            st = jax.local_devices()[0].memory_stats()
            return round(st.get("bytes_in_use", 0) / 2**20)
        except Exception:
            return None

    # query path: (batch, 32) with all-live masks (ColBERT augmentation)
    qids = jnp.asarray(rng.integers(
        4, cfg.vocab_size, size=(args.batch, cfg.query_max_tokens)),
        jnp.int32)
    qmask = jnp.ones_like(qids)
    p50, p90 = _timeit(lambda: apply(params, qids, qmask), args.iters)
    print(json.dumps({
        "stage": "flagship_encode_query", "p50_ms": round(p50, 2),
        "p90_ms": round(p90, 2), "batch": args.batch,
        "params_m": round(n_params / 1e6), "dtype": args.encoder_dtype,
        "backend": backend, "hbm_mb": mem_mb()}), flush=True)

    # doc path: (doc_batch, doc_len); throughput = docs/s
    dlen = args.doc_len if args.doc_len is not None else cfg.doc_max_tokens
    dbatch = args.flagship_doc_batch
    dids = jnp.asarray(rng.integers(4, cfg.vocab_size, size=(dbatch, dlen)),
                       jnp.int32)
    dmask = jnp.ones_like(dids)
    p50, p90 = _timeit(lambda: apply(params, dids, dmask),
                       max(2, args.iters // 4))
    toks = dbatch * dlen
    flops = 2.0 * n_params * toks  # dense-matmul estimate (excl. attention)
    print(json.dumps({
        "stage": "flagship_encode_docs", "p50_ms": round(p50, 2),
        "p90_ms": round(p90, 2), "doc_batch": dbatch, "doc_len": dlen,
        "docs_per_sec": round(dbatch / (p50 / 1e3), 1),
        "tokens_per_sec": round(toks / (p50 / 1e3)),
        "approx_tflops": round(flops / (p50 / 1e3) / 1e12, 1),
        "dtype": args.encoder_dtype, "backend": backend,
        "hbm_mb": mem_mb()}), flush=True)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", action="store_true",
                    help="measure the full 560M jina-colbert-v2 geometry "
                         "(random weights) instead of the cascade probe")
    ap.add_argument("--flagship-doc-batch", type=int, default=32)
    ap.add_argument("--n-docs", type=int, default=None)
    ap.add_argument("--doc-len", type=int, default=None,
                    help="tokens per doc (default: 128 for the cascade probe,\n                    the preset's doc_max_tokens for --flagship)")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prefilter", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-brute", action="store_true")
    ap.add_argument("--index-dtype", choices=["both", "int8", "int4"],
                    default="both",
                    help="which token-embedding layout(s) to generate and "
                         "probe. 'both' holds the int8 index AND a packed "
                         "int4 view at once (fine to ~500k docs); at 1M x "
                         "64 that is 12+ GiB — probe each dtype in its own "
                         "invocation instead (measured OOM on a 16 GiB "
                         "chip)")
    ap.add_argument("--postings-cap", type=int, default=512)
    ap.add_argument("--q-max", type=int, default=32,
                    help="BM25 query term slots (kernel cost ~ B*Q*P)")
    ap.add_argument("--encode-docs", type=int, default=0, metavar="N",
                    help="ALSO measure corpus-encoding throughput over N "
                         "docs (the indexing hot loop)")
    ap.add_argument("--encoder-dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--profile", type=str, default=None, metavar="DIR",
                    help="also write a jax.profiler trace of one cascade "
                         "batch to DIR (utils/profiling.py)")
    args = ap.parse_args(argv)

    if args.flagship:
        return probe_flagship(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    n_docs = args.n_docs or (100_000 if on_tpu else 2_000)
    doc_len = args.doc_len if args.doc_len is not None else 128
    dim, batch = args.dim, args.batch
    log(f"backend={backend} n_docs={n_docs} doc_len={doc_len} batch={batch}")

    from hybrid_rag_colbertv2_tpu.index.dense import DenseTokenIndex
    from hybrid_rag_colbertv2_tpu.index.lexical import LexicalIndex
    from hybrid_rag_colbertv2_tpu.models.colbert import (
        ColBERTConfig, ColBERTEncoder)
    from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
    from hybrid_rag_colbertv2_tpu.ops.bm25 import bm25_scores_device
    from hybrid_rag_colbertv2_tpu.ops.maxsim import (
        maxsim_scores_int8, maxsim_scores_int8_doc)
    from hybrid_rag_colbertv2_tpu.ops.prefilter import (
        maxsim_topk_pruned, pooled_doc_embeddings)
    from hybrid_rag_colbertv2_tpu.retrieval.cascade import hybrid_cascade

    rng = np.random.default_rng(0)
    vocab = np.array([f"term{i}" for i in range(5_000)])
    corpus = [" ".join(r) for r in vocab[
        rng.integers(0, len(vocab), size=(min(n_docs, 20_000), 12))]]
    full_corpus = (corpus * max(1, n_docs // len(corpus) + 1)
                   if len(corpus) < n_docs else corpus)[:n_docs]
    t0 = time.perf_counter()
    lex = LexicalIndex.build(full_corpus, postings_cap=args.postings_cap)
    log(f"bm25 build: {time.perf_counter() - t0:.1f}s "
        f"max_post={lex.max_postings}")

    n_pad = ((n_docs + 127) // 128) * 128
    lengths = np.zeros((n_pad,), np.int32)
    lengths[:n_docs] = rng.integers(doc_len // 2, doc_len + 1, n_docs)

    want_int8 = args.index_dtype in ("both", "int8")
    want_int4 = args.index_dtype in ("both", "int4")

    @jax.jit
    def gen_index(key, lens):
        k1, k2 = jax.random.split(key)
        # int4 mode generates the nibble-packed PAIR-ROW array directly:
        # (n_pad * L/2, D) full-width int8 (ops/quant.quantize_int4_groups
        # layout). For a latency probe only the byte layout matters, not
        # the values — any int8 array is a valid packed-nibble array;
        # never materialize the full array it would be unpacked from.
        rows = n_pad * doc_len if want_int8 else n_pad * doc_len // 2
        q8 = jax.random.randint(k1, (rows, dim), -127, 128, jnp.int8)
        sc = (0.9 + 0.2 * jax.random.uniform(k2, (n_pad * doc_len,))) / (
            127.0 * np.sqrt(dim))
        tok = jnp.arange(doc_len, dtype=jnp.int32)
        valid = (tok[None, :] < lens[:, None]).reshape(-1)
        return q8, jnp.where(valid, sc, 0.0)

    t0 = time.perf_counter()
    base, scales = gen_index(jax.random.PRNGKey(0), jnp.asarray(lengths))
    lens_dev = jnp.asarray(lengths)
    q8 = base if want_int8 else None
    if want_int4:
        # packed pair-row view: slice the int8 index's first half of ROWS
        # when both layouts are probed together (contiguous slice, no
        # relayout), else `base` already IS the packed array
        q4 = (jax.block_until_ready(
            jax.jit(lambda x: x[: n_pad * doc_len // 2])(base))
            if want_int8 else base)
        from hybrid_rag_colbertv2_tpu.ops.quant import int4_group_size
        gsz = int4_group_size(doc_len)
        # per-token-GROUP scales, (G, n_pad) doc-axis-minor layout
        dscales4 = jnp.transpose(jnp.max(
            scales.reshape(n_pad, doc_len // gsz, gsz), axis=2))
    if want_int8:
        pooled = pooled_doc_embeddings(q8, scales, lens_dev, doc_len=doc_len)
    else:
        pooled = pooled_doc_embeddings(q4, None, lens_dev, doc_len=doc_len,
                                       doc_scales=dscales4, packed_int4=True)
    jax.block_until_ready(pooled)
    log(f"index gen+pool: {time.perf_counter() - t0:.1f}s "
        f"({base.size / 2**30:.2f} GiB {args.index_dtype}, pooled "
        f"{pooled.size * 2 / 2**20:.0f} MiB)")

    tok = ColBERTTokenizer.train_bpe(corpus[:2000], vocab_size=8192)
    encoder = ColBERTEncoder(
        ColBERTConfig.small(vocab_size=tok.vocab_size,
                            dtype=jnp.dtype(args.encoder_dtype)),
        tok, seed=0)

    if args.encode_docs:
        # corpus-encoding throughput (the indexing hot loop; reference:
        # 12.87 s for 287 chunks, README.md:160)
        texts = (full_corpus * (args.encode_docs // len(full_corpus) + 1)
                 )[: args.encode_docs]
        scal_l = jax.jit(lambda v: jnp.sum(v[:1]).astype(jnp.float32))
        # full-size warmup: compiles the forward AND the final concat /
        # scalarizer shapes (one-time costs that would otherwise pollute
        # the throughput number)
        embs, lens = encoder.encode_docs(texts, doc_len=doc_len)
        float(scal_l(lens))
        t0 = time.perf_counter()
        embs, lens = encoder.encode_docs(texts, doc_len=doc_len)
        float(scal_l(lens))          # force completion
        dt = time.perf_counter() - t0
        print(json.dumps({
            "stage": f"encode_docs_{args.encoder_dtype}",
            "docs": args.encode_docs, "seconds": round(dt, 2),
            "docs_per_sec": round(args.encode_docs / dt, 1),
            "backend": backend}), flush=True)
    queries = [" ".join(rng.choice(vocab, size=6)) for _ in range(batch)]
    q_emb = jax.block_until_ready(encoder.encode_queries(queries))
    q_terms = jnp.asarray(np.stack(
        [lex.encode_query(q, args.q_max) for q in queries]))
    lexd = (jnp.asarray(lex.indptr), jnp.asarray(lex.post_docs),
            jnp.asarray(lex.post_weights))

    results = []

    def emit(name, p50, p90):
        row = {"stage": name, "p50_ms": round(p50, 3), "p90_ms": round(p90, 3),
               "batch": batch, "n_docs": n_docs, "backend": backend}
        results.append(row)
        print(json.dumps(row), flush=True)

    # --- isolated stages ---------------------------------------------------
    log(f"scalar-fetch rtt: {measure_rtt_ms():.1f}ms")
    emit("encode_query", *_timeit(
        lambda: encoder.encode_queries(queries), args.iters))
    emit("bm25", *_timeit(
        lambda: bm25_scores_device(
            q_terms, *lexd, n_docs=n_docs, max_postings=lex.max_postings),
        args.iters))
    # the kernel the production cascade actually uses (sort-based top-k,
    # ops/bm25.bm25_topk_device) — the dense-scatter scorer above is the
    # comparison baseline, not the served path
    from hybrid_rag_colbertv2_tpu.ops.bm25 import bm25_topk_device

    emit("bm25_topk", *_timeit(
        lambda: bm25_topk_device(
            q_terms, *lexd, n_docs=n_docs, max_postings=lex.max_postings,
            k=100)[0],
        args.iters))
    from hybrid_rag_colbertv2_tpu.ops.maxsim import maxsim_scores_int4_doc

    if not args.skip_brute:
        if want_int8:
            emit("dense_scan_brute_int8", *_timeit(
                lambda: maxsim_scores_int8(
                    q_emb, q8, scales, lens_dev, doc_len=doc_len),
                args.iters))
            # per-document-scale layout ("int8-doc"): same embedding
            # bytes, (N,) scales; dup-row contract doesn't change cost
            dscales = jnp.max(scales.reshape(n_pad, doc_len), axis=1)
            emit("dense_scan_brute_int8doc", *_timeit(
                lambda: maxsim_scores_int8_doc(
                    q_emb, q8, dscales, lens_dev, doc_len=doc_len),
                args.iters))
        if want_int4:
            # nibble-packed "int4-doc" layout: HALF the embedding bytes
            emit("dense_scan_brute_int4doc", *_timeit(
                lambda: maxsim_scores_int4_doc(
                    q_emb, q4, dscales4, lens_dev, doc_len=doc_len),
                args.iters))
    # pruned two-stage top-k — the served path, per requested layout
    if want_int8:
        emit(f"dense_pruned_C{args.prefilter}", *_timeit(
            lambda: maxsim_topk_pruned(
                q_emb, q8, scales, lens_dev, pooled, doc_len=doc_len,
                n_docs=n_docs, n_candidates=args.prefilter, k=100)[0],
            args.iters))
    if want_int4:
        emit(f"dense_pruned_int4_C{args.prefilter}", *_timeit(
            lambda: maxsim_topk_pruned(
                q_emb, q4, None, lens_dev, pooled, doc_scales=dscales4,
                doc_len=doc_len, n_docs=n_docs,
                n_candidates=args.prefilter, k=100)[0],
            args.iters))

    # pruned-path sub-stages + final-rerank geometry, isolated so batch
    # scaling can be attributed stage-by-stage (VERDICT r3 next #8):
    # stage A amortizes across the batch (matmul over N), stage B and the
    # rerank gather are O(batch) with no cross-query reuse.
    from hybrid_rag_colbertv2_tpu.ops.prefilter import (
        exact_maxsim_on_candidates, pooled_proxy_topk)

    c_pad = min(((args.prefilter + 127) // 128) * 128, n_pad)
    emit(f"pruned_A_proxy_topk_C{args.prefilter}", *_timeit(
        lambda: pooled_proxy_topk(q_emb, pooled, lens_dev, n_docs=n_docs,
                                  c=c_pad, approx_recall=0.95),
        args.iters))
    cand = jax.block_until_ready(pooled_proxy_topk(
        q_emb, pooled, lens_dev, n_docs=n_docs, c=c_pad,
        approx_recall=0.95))
    if want_int8:
        emit(f"pruned_B_exact_C{args.prefilter}", *_timeit(
            lambda: exact_maxsim_on_candidates(
                q_emb, q8, scales, lens_dev, cand, doc_len=doc_len),
            args.iters))
    if want_int4:
        # stage B on the packed int4 layout: the stage is gather-bound
        # (docs/architecture.md — XLA's scattered-row rate is the floor),
        # so halving the gathered bytes is the one lever that moves it
        emit(f"pruned_B_exact_int4_C{args.prefilter}", *_timeit(
            lambda: exact_maxsim_on_candidates(
                q_emb, q4, None, lens_dev, cand, doc_scales=dscales4,
                doc_len=doc_len),
            args.iters))
    if want_int8:
        emit("rerank_exact_64cand", *_timeit(
            lambda: exact_maxsim_on_candidates(
                q_emb, q8, scales, lens_dev, cand[:, :64], doc_len=doc_len),
            args.iters))
    if want_int4:
        emit("rerank_exact_int4_64cand", *_timeit(
            lambda: exact_maxsim_on_candidates(
                q_emb, q4, None, lens_dev, cand[:, :64],
                doc_scales=dscales4, doc_len=doc_len),
            args.iters))

    # --- isolated suspects: top-k over N and RRF fusion ---------------------
    from hybrid_rag_colbertv2_tpu.ops.fusion import rrf_from_topk

    fake_scores = jax.random.normal(jax.random.PRNGKey(2), (batch, n_docs))
    topk100 = jax.jit(lambda s: jax.lax.top_k(s, 100)[0])
    emit("topk100_over_N", *_timeit(lambda: topk100(fake_scores), args.iters))
    ids_a = jax.random.randint(jax.random.PRNGKey(3), (batch, 100), 0,
                               n_docs, jnp.int32)
    ids_b = jax.random.randint(jax.random.PRNGKey(4), (batch, 100), 0,
                               n_docs, jnp.int32)
    emit("rrf_fuse", *_timeit(
        lambda: rrf_from_topk(ids_a, ids_b, k=50)[0], args.iters))

    # --- end-to-end cascade, per requested layout ---------------------------
    def run_cascade(prefilter, int4):
        if int4:
            ids, _, _ = hybrid_cascade(
                q_emb, q_terms, *lexd, q4, None, lens_dev,
                pooled if prefilter else None, dscales4,
                prefilter=prefilter, n_docs=n_docs,
                max_postings=lex.max_postings, doc_len=doc_len,
                is_int8=False, k_each=100, k_fuse=50, k_final=10)
        else:
            ids, _, _ = hybrid_cascade(
                q_emb, q_terms, *lexd, q8, scales, lens_dev,
                pooled if prefilter else None, prefilter=prefilter,
                n_docs=n_docs, max_postings=lex.max_postings,
                doc_len=doc_len, is_int8=True,
                k_each=100, k_fuse=50, k_final=10)
        return ids

    for int4, tag in ((False, ""), (True, "_int4")):
        if (int4 and not want_int4) or (not int4 and not want_int8):
            continue
        if not args.skip_brute:
            emit(f"cascade_brute{tag}", *_timeit(
                lambda: run_cascade(0, int4), args.iters))
        emit(f"cascade_pruned{tag}_C{args.prefilter}", *_timeit(
            lambda: run_cascade(args.prefilter, int4), args.iters))

    if args.profile:
        from hybrid_rag_colbertv2_tpu.utils import profiling

        with profiling.trace(args.profile):
            jax.block_until_ready(run_cascade(args.prefilter))
        log(f"profiler trace written to {args.profile}")

    log("summary: " + ", ".join(
        f"{r['stage']}={r['p50_ms']}ms" for r in results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
