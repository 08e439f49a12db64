"""Retrieval quality evaluation over a REAL indexed corpus.

The reference publishes no accuracy numbers at all (SURVEY.md section 6).
This tool measures, on whatever corpus the app has indexed:

  * hit@k        — fraction of ICT pseudo-queries (a sentence sampled from
                   a chunk, train/data.py) whose SOURCE chunk is retrieved;
  * agreement@k  — overlap between the CONFIGURED cascade (prefilter /
                   postings cap / approx top-k as set) and the exact one
                   (prefilter=0, approx_topk_recall=1.0) — quantifies what
                   the approximation knobs actually cost on YOUR data;
  * retrieval p50 per batch (honest queued-dispatch timing).

Usage:
  python -m hybrid_rag_colbertv2_tpu.tools.eval_recall \
      [--config cfg.json] [--n-queries 32] [--k 10] [--batch 8]

Prints one JSON object to stdout.
"""

from __future__ import annotations

import argparse
import copy
import json
import sys


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--n-queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)

    import numpy as np

    from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
    from hybrid_rag_colbertv2_tpu.config import RAGConfig
    from hybrid_rag_colbertv2_tpu.train.data import pseudo_query_pairs

    cfg = RAGConfig.load(args.config) if args.config else RAGConfig()
    app = RAGApplication(cfg, use_ollama=False)
    app.initialize_chatbot(use_mesh=False)
    corpus = app.store.all_chunk_texts()
    if len(corpus) < 2:
        raise SystemExit("index at least 2 chunks first (--upload)")

    pairs = pseudo_query_pairs(corpus, n_pairs_per_doc=2, seed=0)
    rng = np.random.default_rng(0)
    rng.shuffle(pairs)
    pairs = pairs[: args.n_queries]
    queries = [q for q, _ in pairs]
    sources = np.array([i for _, i in pairs])
    log(f"{len(corpus)} chunks, {len(pairs)} pseudo-queries, "
        f"config: prefilter={cfg.dense_prefilter}, "
        f"approx={cfg.approx_topk_recall}")

    def run_all(cfg_used):
        app.retriever.config = cfg_used
        ids = []
        for i in range(0, len(queries), args.batch):
            batch = queries[i : i + args.batch]
            got, _ = app.retriever.retrieve_batch(batch, args.k)
            ids.append(got[: len(batch)])
        return np.concatenate(ids, axis=0)

    ids_cfg = run_all(cfg)
    exact_cfg = copy.deepcopy(cfg)
    exact_cfg.dense_prefilter = 0
    exact_cfg.approx_topk_recall = 1.0
    ids_exact = run_all(exact_cfg)
    app.retriever.config = cfg

    def hit_at_k(ids):
        return float(np.mean([
            sources[i] in set(ids[i].tolist()) for i in range(len(pairs))]))

    agree = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / max(1, (b >= 0).sum())
        for a, b in zip(ids_cfg, ids_exact)]))

    from hybrid_rag_colbertv2_tpu.utils.timing import queued_timeit

    bq = queries[: args.batch]
    p50, _ = queued_timeit(
        lambda: app.retriever.encoder.encode_queries(bq), 4, 2)
    # end-to-end per-batch latency through the host wrapper
    import time
    app.retriever.retrieve_batch(bq, args.k)  # warm
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        app.retriever.retrieve_batch(bq, args.k)
    e2e_ms = (time.perf_counter() - t0) / reps * 1e3

    print(json.dumps({
        "chunks": len(corpus),
        "queries": len(pairs),
        "k": args.k,
        f"hit@{args.k}_configured": round(hit_at_k(ids_cfg), 3),
        f"hit@{args.k}_exact": round(hit_at_k(ids_exact), 3),
        f"agreement@{args.k}": round(agree, 3),
        "encode_batch_ms": round(p50, 2),
        "retrieve_batch_ms": round(e2e_ms, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
