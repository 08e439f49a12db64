"""The hybrid retrieval cascade — one jitted function, never leaves HBM.

Behavioral contract (reference ``HybridRetriever.retrieve``,
local_rag_complete.py:894-935):

    Stage 1  BM25 top-100            (:903, _bm25_search :937)
    Stage 2  ColBERT top-100         (:909, _colbert_search :952)
    Fusion   RRF(k=60) -> top-50     (:915-916, _reciprocal_rank_fusion :960)
    Fetch    candidate texts         (:922, _fetch_chunks_from_db :980)
    Stage 3  ColBERT rerank -> top-10 (:928, _colbert_rerank :996)

Implementation differences (deliberate, SURVEY.md section 7):
  * stages 1+2 score over the *device-resident* indexes (Pallas MaxSim +
    CSR BM25) instead of CPU libraries;
  * fusion + candidate-select + rerank all run inside the same jit — the
    only host work is query tokenization before and text fetch for the
    final top-k after;
  * rerank gathers the already-indexed token embeddings (exact fp32
    rescoring) instead of re-encoding candidate texts (the reference
    re-encodes 50 docs per query, its rerank hot loop :783);
  * one global id space (corpus row index) end to end — the reference mixes
    0-based corpus positions with 1-based DB ids (latent bug, SURVEY.md).
"""

from __future__ import annotations

import functools
import json
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RAGConfig, effective_final_fusion
from ..index.dense import DenseTokenIndex
from ..index.manager import IndexManager
from ..ops.bm25 import bm25_topk_device
from ..ops.fusion import (final_topk_select, rrf_from_topk,
                          union_floor_split)
from ..ops.maxsim import (maxsim_scores, maxsim_scores_int4_doc,
                          maxsim_scores_int8, maxsim_scores_int8_doc)
from ..ops.prefilter import (approx_or_exact_topk, candidate_sims,
                             maxsim_topk_pruned)
from ..utils.logging import StageTimer, get_logger

log = get_logger(__name__)


def pack_query_batch(encoder, lexical, queries: Sequence[str],
                     query_max_terms: Optional[int] = None,
                     term_buckets: Optional[Sequence[int]] = None
                     ) -> jax.Array:
    """Host tokenization for the fused single-dispatch retrieve: query
    token ids (B, Lq) ‖ BM25 term ids (B, Q) concatenated into ONE int32
    array — one host->device transfer per batch. The jit side splits at
    ``encoder.cfg.query_max_tokens``; every fused wrapper (flat, sharded,
    bucketed×sharded, bench.py) MUST use this layout.

    ``term_buckets``: round the BM25 term width Q DOWN to the smallest
    bucket covering the batch's real term count instead of always using
    the ``query_max_terms`` ceiling. The lexical stage costs O(B*Q*P) and
    -1 padding slots are dead weight the kernel still sorts; typical
    queries carry ~4-10 terms, so an 8-wide dispatch quarters the BM25
    sort vs the 32-wide ceiling. Each distinct width compiles once
    (bounded by the bucket menu); trimming only removes -1 columns, so
    scores are bit-identical across widths."""
    lq = encoder.cfg.query_max_tokens
    q_ids = np.stack([encoder.tokenizer.encode_query(q, lq)
                      for q in queries])
    q_terms = np.stack([lexical.encode_query(q, query_max_terms)
                        for q in queries])
    q_terms = _trim_terms(q_terms, term_buckets)
    return jnp.asarray(np.concatenate(
        [q_ids.astype(np.int32), q_terms.astype(np.int32)], axis=1))


def _trim_terms(q_terms: np.ndarray,
                term_buckets: Optional[Sequence[int]]) -> np.ndarray:
    """Trim the (B, Q) BM25 term-id array's -1 padding columns down to the
    smallest covering bucket width (see pack_query_batch)."""
    if not term_buckets or q_terms.size == 0:
        return q_terms
    # encode_query left-packs real ids, so the max per-row count IS the
    # needed width
    need = int((q_terms >= 0).sum(axis=1).max())
    width = q_terms.shape[1]
    for b in sorted(term_buckets):
        if b >= need and b < width:
            width = b
            break
    return q_terms[:, :width]


def encode_query_terms(lexical, queries: Sequence[str],
                       query_max_terms: Optional[int] = None,
                       term_buckets: Optional[Sequence[int]] = None
                       ) -> np.ndarray:
    """Batch BM25 term-id encoding with optional width bucketing — the
    non-fused counterpart of pack_query_batch's term half."""
    q_terms = np.stack([lexical.encode_query(q, query_max_terms)
                        for q in queries])
    return _trim_terms(q_terms, term_buckets)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_docs", "max_postings", "doc_len", "is_int8",
        "k_each", "k_dense", "k_fuse", "k_final", "rrf_k", "prefilter",
        "approx_recall",
        "final_fusion", "fusion_weight_bm25",
    ),
)
def hybrid_cascade(
    q_emb: jax.Array,          # (B, Lq, D) query token embeddings
    q_terms: jax.Array,        # (B, Q) BM25 term ids, -1 padded
    indptr: jax.Array,
    post_docs: jax.Array,
    post_weights: jax.Array,
    emb_flat: jax.Array,       # (N_pad * L, D)
    scales: Optional[jax.Array],
    doc_lengths: jax.Array,    # (N_pad,)
    pooled: Optional[jax.Array] = None,  # (N_pad, D) — required if prefilter
    doc_scales: Optional[jax.Array] = None,  # (N_pad,) for "int8-doc";
                                             # (G, N_pad) for "int4-doc"
    *,
    n_docs: int,
    max_postings: int,
    doc_len: int,
    is_int8: bool,
    k_each: int = 100,        # BM25 candidate depth (bm25_top_k)
    k_dense: Optional[int] = None,  # dense candidate depth (colbert_top_k);
                                    # defaults to k_each
    k_fuse: int = 50,
    k_final: int = 10,
    rrf_k: int = 60,
    prefilter: int = 0,        # >0: pruned dense stage (ops/prefilter.py)
    approx_recall: float = 0.95,  # candidate top-k via approx_max_k when
                                  # k <= n/8 (exact rerank still follows)
    final_fusion: str = "rerank",  # "rerank" = reference parity (final
                                   # top-k by exact MaxSim alone,
                                   # local_rag_complete.py:928); "rrf" =
                                   # RRF(rerank rank, candidate-RRF rank)
                                   # — hedges dense misses with lexical
                                   # evidence (opt-in, beyond parity)
    fusion_weight_bm25: float = 0.5,  # calibrated-hybrid leg weight: 0.5
                                      # = the reference's unweighted RRF;
                                      # the measured gate raises it when
                                      # the dense leg is weak
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """-> (final_ids (B, k_final), final_scores, debug dict)."""
    b = q_emb.shape[0]
    n_pad = doc_lengths.shape[0]

    # Stage 2: dense top-k — pruned two-stage search or full MaxSim scan
    ke = min(k_dense if k_dense is not None else k_each, n_docs)
    if prefilter > 0:
        ms_vals, ms_ids = maxsim_topk_pruned(
            q_emb, emb_flat, scales if is_int8 else None, doc_lengths,
            pooled, doc_scales=doc_scales, doc_len=doc_len, n_docs=n_docs,
            n_candidates=prefilter, k=ke, approx_recall=approx_recall)
    else:
        if (doc_scales is not None
                and emb_flat.shape[0] * 2 == n_pad * doc_len):
            # nibble-packed int4-doc pair-rows (shape-static detection
            # under jit — by ROW count; width equals the raw layouts')
            ms = maxsim_scores_int4_doc(q_emb, emb_flat, doc_scales,
                                        doc_lengths, doc_len=doc_len)
        elif doc_scales is not None:
            ms = maxsim_scores_int8_doc(q_emb, emb_flat, doc_scales,
                                        doc_lengths, doc_len=doc_len)
        elif is_int8:
            ms = maxsim_scores_int8(q_emb, emb_flat, scales, doc_lengths,
                                    doc_len=doc_len)
        else:
            ms = maxsim_scores(q_emb, emb_flat, doc_lengths, doc_len=doc_len)
        ms = ms[:, :n_docs]                             # (B, n_docs)
        ms_vals, ms_ids = approx_or_exact_topk(ms, ke, approx_recall)
        ms_ids = ms_ids.astype(jnp.int32)

    # Stage 1: BM25 top-k — sort-based exact kernel, no (B, N) scatter
    # (ops/bm25.py::bm25_topk_device); missing slots are id -1
    bm25_vals, bm25_ids = bm25_topk_device(
        q_terms, indptr, post_docs, post_weights,
        n_docs=n_docs, max_postings=max_postings, k=min(k_each, n_docs))

    # Fusion: (weighted) RRF -> k_fuse candidates. In union mode both
    # legs' top-m are floored into the candidate set so the final
    # ordering's structural guarantee is exact (ops/fusion.py).
    w = fusion_weight_bm25
    kf = min(k_final, k_fuse, n_docs)
    fm = (union_floor_split(kf, w) if final_fusion == "union"
          else (0, 0))
    fused_scores, fused_ids = rrf_from_topk(
        bm25_ids, ms_ids, k=min(k_fuse, n_docs), rrf_k=rrf_k,
        weights=(2.0 * w, 2.0 * (1.0 - w)), floor_m=fm)

    # Stage 3: exact fp32 rerank over gathered candidate embeddings.
    # Dequantization applies to the (Lq, L) sims AFTER the fp32 matmul
    # (sim(q, s*e) = s * (q . e) exactly) so the gather stays int8 and no
    # scaled-fp32 copy of the candidate embeddings is materialized — the
    # same traffic fix as ops/prefilter.exact_maxsim_on_candidates.
    safe = jnp.where(fused_ids >= 0, fused_ids, n_pad - 1)
    packed4 = emb_flat.shape[0] * 2 == n_pad * doc_len   # int4 pair-rows
    embs3 = emb_flat.reshape(n_pad,
                             doc_len // 2 if packed4 else doc_len, -1)
    tok = jnp.arange(doc_len, dtype=jnp.int32)

    def rerank_one(q, cand, live):
        docs = embs3[cand]            # (k_fuse, L, D) raw (L/2 if packed)
        sims = candidate_sims(q, docs, packed_pairs=packed4)
        if is_int8:
            sims = sims * scales.reshape(n_pad, doc_len)[cand][:, None, :]
        elif doc_scales is not None and doc_scales.ndim == 2:
            # int4-doc group scales (G, N) -> per-row (k_fuse, L)
            gsz = doc_len // doc_scales.shape[0]
            sc = jnp.repeat(jnp.transpose(doc_scales[:, cand]), gsz,
                            axis=1)
            sims = sims * sc[:, None, :]
        elif doc_scales is not None:
            sims = sims * doc_scales[cand][:, None, None]
        lens = jnp.where(live, doc_lengths[cand], 0)
        valid = tok[None, :] < lens[:, None]            # (k_fuse, L)
        sims = jnp.where(valid[:, None, :], sims, -1e30)
        return jnp.sum(jnp.max(sims, axis=-1), axis=-1)  # (k_fuse,)

    rerank = jax.vmap(rerank_one)(q_emb.astype(jnp.float32), safe,
                                  fused_ids >= 0)       # (B, k_fuse)

    final_ids, top_vals = final_topk_select(
        rerank, fused_ids, kf, rrf_k=rrf_k, final_fusion=final_fusion,
        weight_cand=fusion_weight_bm25,
        bm25_ids=bm25_ids, dense_ids=ms_ids)
    debug = {
        "bm25_ids": bm25_ids, "bm25_vals": bm25_vals,
        "ms_ids": ms_ids, "ms_vals": ms_vals,
        "fused_ids": fused_ids, "fused_scores": fused_scores,
        "rerank": rerank,
    }
    return final_ids.astype(jnp.int32), top_vals, debug


# (model, query_len, statics) -> jitted encoder+cascade executable.
# Bounded LRU (VERDICT r2 weak #6): serving processes probing many
# distinct k values get the hot ks cached and the rest evicted, and
# fresh retriever instances (eval/gate build one per config) share
# executables instead of re-jitting. ColBERT models hash by geometry
# (flax dataclass), so equal-config encoders hit the same entry.
from ..utils.cache import JitCache  # noqa: E402  (import cycle: none)

_FUSED_CACHE = JitCache(max_entries=16)


def fused_cascade_fn(model, query_len: int, statics: Dict):
    """Memoized jitted fn: encoder forward + hybrid_cascade in ONE
    dispatch. ``statics`` are hybrid_cascade's static kwargs."""
    key = (model, query_len, tuple(sorted(statics.items())))

    def build():
        sd = dict(statics)

        @jax.jit
        def fused(params, packed, indptr, post_docs, post_weights,
                  emb_flat, scales, doc_lengths, pooled, doc_scales):
            q_ids = packed[:, :query_len]
            q_emb = model.apply({"params": params}, q_ids,
                                jnp.ones_like(q_ids))
            ids, scores, _ = hybrid_cascade(
                q_emb, packed[:, query_len:], indptr, post_docs,
                post_weights, emb_flat, scales, doc_lengths, pooled,
                doc_scales, **sd)
            return ids, scores

        return fused

    return _FUSED_CACHE.get_or_build(key, build)


def fused_bucketed_cascade_fn(model, query_len: int, bucket_geoms,
                              statics: Dict):
    """Memoized jitted fn: encoder forward + the FULL bucketed cascade in
    ONE dispatch (VERDICT r3 next #3 — the composed per-bucket path cost
    ~5 dispatches + separate transfers, silently losing the fusion win on
    high-dispatch-cost devices; the sharded bucketed path already proved
    this structure, parallel/sharded.py::_make_sharded_bucketed_cascade_impl,
    minus the collectives).

    ``bucket_geoms``: tuple of (n_pad, doc_len, quant) per bucket (the
    hashable cache key form). Operands after the lexical CSR are
    bucket_of, row_of, then 6 arrays per bucket: emb_flat, scales,
    doc_lengths, pooled, doc_scales, global_ids (zero-size placeholders
    where a layout has no such array)."""
    key = (model, query_len, tuple(bucket_geoms),
           tuple(sorted(statics.items())), "bucketed")

    def build():
        sd = dict(statics)
        n_docs = sd["n_docs"]
        max_postings = sd["max_postings"]
        k_each = sd["k_each"]
        kd = sd["k_dense"]
        kf = sd["k_fuse"]
        kfin = sd["k_final"]
        rrf_k = sd["rrf_k"]
        prefilter = sd["prefilter"]
        approx_recall = sd["approx_recall"]
        final_fusion = sd["final_fusion"]
        w = sd["fusion_weight_bm25"]
        geoms = [dict(n_pad=g[0], doc_len=g[1], quant=g[2])
                 for g in bucket_geoms]

        @jax.jit
        def fused(params, packed, indptr, post_docs, post_weights,
                  bucket_of, row_of, *flat):
            assert len(flat) == 6 * len(geoms)
            q_ids = packed[:, :query_len]
            q_emb = model.apply({"params": params}, q_ids,
                                jnp.ones_like(q_ids))
            q_terms = packed[:, query_len:]

            # dense: per-bucket top-k -> global ids -> merged top-k
            lv_all, gi_all = [], []
            for bi, geom in enumerate(geoms):
                emb, sc, lens, pooled, dsc, gid = flat[6 * bi: 6 * bi + 6]
                n_b = geom["n_pad"]
                dl = geom["doc_len"]
                quant = geom["quant"]
                keb = min(kd, n_b)
                if prefilter > 0:
                    lv, li = maxsim_topk_pruned(
                        q_emb, emb, sc if quant == "int8" else None,
                        lens, pooled,
                        doc_scales=(dsc if quant in ("int8-doc",
                                                     "int4-doc") else None),
                        doc_len=dl, n_docs=n_b, n_candidates=prefilter,
                        k=keb, approx_recall=approx_recall)
                else:
                    if quant == "int4-doc":
                        ms = maxsim_scores_int4_doc(q_emb, emb, dsc, lens,
                                                    doc_len=dl)
                    elif quant == "int8-doc":
                        ms = maxsim_scores_int8_doc(q_emb, emb, dsc, lens,
                                                    doc_len=dl)
                    elif quant == "int8":
                        ms = maxsim_scores_int8(q_emb, emb, sc, lens,
                                                doc_len=dl)
                    else:
                        ms = maxsim_scores(q_emb, emb, lens, doc_len=dl)
                    lv, li = approx_or_exact_topk(ms, keb, approx_recall)
                safe = jnp.clip(li, 0, n_b - 1)
                g = jnp.where(li >= 0, gid[safe], -1)  # padding rows: -1
                lv_all.append(jnp.where(g >= 0, lv, -1e30))
                gi_all.append(g.astype(jnp.int32))
            lv = jnp.concatenate(lv_all, axis=1)
            gi = jnp.concatenate(gi_all, axis=1)
            ms_vals, pos = jax.lax.top_k(lv, min(kd, n_docs, lv.shape[1]))
            ms_ids = jnp.take_along_axis(gi, pos, axis=1)
            ms_ids = jnp.where(ms_vals > -1e29, ms_ids, -1)

            bm25_vals, bm25_ids = bm25_topk_device(
                q_terms, indptr, post_docs, post_weights,
                n_docs=n_docs, max_postings=max_postings,
                k=min(k_each, n_docs))

            fm = (union_floor_split(kfin, w) if final_fusion == "union"
                  else (0, 0))
            fused_scores, fused_ids = rrf_from_topk(
                bm25_ids, ms_ids, k=kf, rrf_k=rrf_k,
                weights=(2.0 * w, 2.0 * (1.0 - w)), floor_m=fm)

            # exact fp32 rerank: route each candidate to its home bucket.
            # Per-bucket sims with dequant applied AFTER the fp32 matmul
            # (sim(q, s*e) = s * (q . e) exactly — the same traffic fix
            # as the flat path / ops/prefilter): the gather stays in the
            # stored dtype, nothing is padded to l_max, and only the
            # (kf,) per-bucket scores are select-merged. Non-live
            # candidates keep the init value; final_topk_select masks
            # them to -inf before ordering, as before.
            safe_c = jnp.clip(fused_ids, 0, n_docs - 1)
            cand_bucket = bucket_of[safe_c]
            cand_row = row_of[safe_c]

            def rerank_one(q, cand, cbucket, crow, live):
                acc = jnp.zeros((kf,), jnp.float32)
                for bi, geom in enumerate(geoms):
                    emb, sc, lens, _, dsc, _ = flat[6 * bi: 6 * bi + 6]
                    n_b = geom["n_pad"]
                    dl = geom["doc_len"]
                    quant = geom["quant"]
                    own = live & (cbucket == bi)
                    rows = jnp.clip(crow, 0, n_b - 1)
                    rpd = dl // 2 if quant == "int4-doc" else dl
                    docs = emb.reshape(n_b, rpd, -1)[rows]  # (kf, rpd, D)
                    sims = candidate_sims(
                        q, docs, packed_pairs=(quant == "int4-doc"))
                    if quant == "int8":
                        sims = sims * sc.reshape(n_b, dl)[rows][:, None, :]
                    elif quant == "int4-doc":
                        # group scales (G, n_b) -> per-row (kf, dl)
                        gsz = dl // dsc.shape[0]
                        scr = jnp.repeat(jnp.transpose(dsc[:, rows]),
                                         gsz, axis=1)
                        sims = sims * scr[:, None, :]
                    elif quant == "int8-doc":
                        sims = sims * dsc[rows][:, None, None]
                    lb = jnp.where(own, lens[rows], 0)
                    tokb = jnp.arange(dl, dtype=jnp.int32)
                    valid = tokb[None, :] < lb[:, None]     # (kf, dl)
                    sims = jnp.where(valid[:, None, :], sims, -1e30)
                    score_b = jnp.sum(jnp.max(sims, axis=-1), axis=-1)
                    acc = jnp.where(own, score_b, acc)
                return acc

            rerank = jax.vmap(rerank_one)(
                q_emb.astype(jnp.float32), safe_c, cand_bucket, cand_row,
                fused_ids >= 0)
            final_ids, top_vals = final_topk_select(
                rerank, fused_ids, kfin, rrf_k=rrf_k,
                final_fusion=final_fusion, weight_cand=w,
                bm25_ids=bm25_ids, dense_ids=ms_ids)
            return final_ids.astype(jnp.int32), top_vals

        return fused

    return _FUSED_CACHE.get_or_build(key, build)


class HybridRetriever:
    """Host-side wrapper: tokenize -> jitted cascade -> result dicts.

    Result dict schema matches the reference's retrieve() output
    (local_rag_complete.py:1004-1013): chunk_id / text / document_id /
    heading_path / has_images / metadata / score / rank.
    """

    def __init__(
        self,
        config: RAGConfig,
        indexes: IndexManager,
        encoder,
        chunk_store=None,          # ingest/store.ChunkStore (optional)
    ):
        self.config = config
        self.indexes = indexes
        self.encoder = encoder
        self.store = chunk_store
        self.timer = StageTimer()
        # per-call stage split of the MOST RECENT retrieve/retrieve_batch
        # (tokenize / encode+cascade / fetch seconds) — the reference's
        # per-retrieve timing printout (local_rag_complete.py:901-933) as
        # structured data; surfaced by RAGApplication.stats()
        self.last_timings: Dict[str, float] = {}
        if indexes.lexical is None or indexes.dense is None:
            raise RuntimeError("indexes not built/loaded")
        self._bind_index()

    def _bind_index(self) -> None:
        """(Re)capture the current index arrays + invalidate jit caches.

        The lexical CSR transfer and the fused cascade's statics (n_docs,
        max_postings) are bound per index build; IndexManager's
        incremental ``add_documents`` replaces the index arrays, and a
        retriever serving the OLD bindings would silently never return
        the appended docs. retrieve_batch re-checks per call."""
        lex = self.indexes.lexical
        dense = self.indexes.dense
        self._lex_dev = dict(
            indptr=jnp.asarray(lex.indptr),
            post_docs=jnp.asarray(lex.post_docs),
            post_weights=jnp.asarray(lex.post_weights),
        )
        self._bucketed_flat = None
        if not isinstance(dense, DenseTokenIndex):
            # bucketed layout: pre-stage the fused cascade's per-bucket
            # operands (zero-size placeholders where a quantization layout
            # has no such array — the jit never touches them)
            prefilter = getattr(self.config, "dense_prefilter", 0)
            flat = []
            for b, gid in zip(dense.buckets, dense.global_ids):
                flat.extend([
                    b.emb_flat,
                    b.scales if b.scales is not None
                    else jnp.zeros((0,), jnp.float32),
                    b.doc_lengths,
                    b.ensure_pooled() if prefilter > 0
                    else jnp.zeros((0,), jnp.float32),
                    b.doc_scales if b.doc_scales is not None
                    else jnp.zeros((0,), jnp.float32),
                    gid,
                ])
            self._bucketed_flat = flat
            self._bucketed_geoms = tuple(
                (b.n_pad, b.doc_len, b.quant) for b in dense.buckets)
        self._bound_key = (id(lex.indptr), id(lex.post_docs),
                           id(dense), dense.n_docs)

    def _check_binding(self) -> None:
        lex = self.indexes.lexical
        dense = self.indexes.dense
        key = (id(lex.indptr), id(lex.post_docs), id(dense), dense.n_docs)
        if key != self._bound_key:
            log.info("index changed since binding — rebinding retriever")
            self._bind_index()

    # ------------------------------------------------------------------
    def _build_fused(self, k_final: int):
        """ONE jitted function: query encoder forward + full cascade.

        retrieve_batch previously cost two device dispatches and two
        host->device transfers per call (encode_queries, then the cascade
        with q_terms). Each dispatch/transfer has a fixed several-ms cost
        on tunneled devices and ~0.1 ms on local hardware (CLAUDE.md
        timing rules); fusing them means one dispatch and one PACKED int32
        transfer — query token ids and BM25 term ids ride in a single
        (B, Lq+Q) array split inside the jit.

        Executables are memoized MODULE-wide (``_FUSED_CACHE``) keyed by
        (model, query length, static knobs): fresh retriever instances
        over the same index geometry — the eval/gate harnesses build many
        — reuse the compiled program instead of re-jitting."""
        cfg = self.config
        dense = self.indexes.dense
        lex = self.indexes.lexical
        statics = dict(
            prefilter=getattr(cfg, "dense_prefilter", 0),
            n_docs=dense.n_docs,
            max_postings=lex.max_postings,
            doc_len=dense.doc_len,
            is_int8=dense.is_int8,
            k_each=min(cfg.bm25_top_k, dense.n_docs),
            k_dense=min(cfg.colbert_top_k, dense.n_docs),
            k_fuse=min(cfg.fusion_candidates, dense.n_docs),
            k_final=min(k_final, cfg.fusion_candidates, dense.n_docs),
            rrf_k=cfg.rrf_k,
            approx_recall=getattr(cfg, "approx_topk_recall", 0.95),
            final_fusion=effective_final_fusion(cfg),
            fusion_weight_bm25=getattr(cfg, "fusion_weight_bm25", 0.5),
        )
        return fused_cascade_fn(self.encoder.model,
                                self.encoder.cfg.query_max_tokens, statics)

    # ------------------------------------------------------------------
    def _build_fused_bucketed(self, k_final: int):
        """The bucketed counterpart of ``_build_fused``: encoder forward +
        per-bucket dense top-k + BM25 + fusion + routed rerank in ONE
        dispatch with ONE packed transfer (VERDICT r3 next #3)."""
        cfg = self.config
        dense = self.indexes.dense
        lex = self.indexes.lexical
        statics = dict(
            prefilter=getattr(cfg, "dense_prefilter", 0),
            n_docs=dense.n_docs,
            max_postings=lex.max_postings,
            k_each=min(cfg.bm25_top_k, dense.n_docs),
            k_dense=min(cfg.colbert_top_k, dense.n_docs),
            k_fuse=min(cfg.fusion_candidates, dense.n_docs),
            k_final=min(k_final, cfg.fusion_candidates, dense.n_docs),
            rrf_k=cfg.rrf_k,
            approx_recall=getattr(cfg, "approx_topk_recall", 0.95),
            final_fusion=effective_final_fusion(cfg),
            fusion_weight_bm25=getattr(cfg, "fusion_weight_bm25", 0.5),
        )
        return fused_bucketed_cascade_fn(
            self.encoder.model, self.encoder.cfg.query_max_tokens,
            self._bucketed_geoms, statics)

    def _cascade_bucketed_composed(self, q_emb, q_terms, k_final: int):
        """Cascade over a length-bucketed dense index (index/bucketed.py)
        composed from per-bucket kernels — ~5 separate dispatches. Kept as
        the equality ORACLE for the fused single-dispatch path
        (tests/test_bucketed.py); retrieve_batch uses the fused path."""
        cfg = self.config
        lex = self.indexes.lexical
        dense = self.indexes.dense
        n = dense.n_docs
        ke = min(cfg.bm25_top_k, n)
        bv, bi = bm25_topk_device(
            q_terms, self._lex_dev["indptr"], self._lex_dev["post_docs"],
            self._lex_dev["post_weights"], n_docs=n,
            max_postings=lex.max_postings, k=ke)
        mv, mi = dense.search_topk(q_emb, min(cfg.colbert_top_k, n),
                                   getattr(cfg, "dense_prefilter", 0),
                                   getattr(cfg, "approx_topk_recall", 0.95))
        mi = jnp.where(mv > -1e29, mi, -1).astype(jnp.int32)
        w = getattr(cfg, "fusion_weight_bm25", 0.5)
        mode = effective_final_fusion(cfg)
        kfin = min(k_final, cfg.fusion_candidates, n)
        fm = union_floor_split(kfin, w) if mode == "union" else (0, 0)
        fused_scores, fused_ids = rrf_from_topk(
            bi, mi, k=min(cfg.fusion_candidates, n), rrf_k=cfg.rrf_k,
            weights=(2.0 * w, 2.0 * (1.0 - w)), floor_m=fm)
        rerank = dense.rerank_scores(q_emb, fused_ids)
        final_ids, tv = final_topk_select(
            rerank, fused_ids, min(kfin, rerank.shape[1]),
            rrf_k=cfg.rrf_k,
            final_fusion=mode,
            weight_cand=w,
            bm25_ids=bi, dense_ids=mi)
        return np.asarray(final_ids), np.asarray(tv)

    def retrieve_batch(
        self, queries: Sequence[str], top_k_final: Optional[int] = None,
        *, timings_out: Optional[Dict[str, float]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (ids (B, k), scores (B, k)) — device path only.

        ``timings_out``: optional caller-local dict the per-call stage
        split is accumulated into. The split must NOT be carved from the
        shared cumulative timer (snapshot/delta): the server's
        double-buffered micro-batcher runs two of these concurrently on
        one retriever, and a shared-totals delta attributes the other
        in-flight call's stages to this one."""
        cfg = self.config
        k = top_k_final or cfg.final_top_k
        self._check_binding()
        lt: Dict[str, float] = {} if timings_out is None else timings_out
        lex = self.indexes.lexical
        dense = self.indexes.dense
        if not isinstance(dense, DenseTokenIndex):
            # bucketed index: same fused single-dispatch contract as the
            # flat path — one packed transfer, one executable
            with self.timer.stage("tokenize", out=lt):
                packed = pack_query_batch(
                    self.encoder, lex, queries,
                    getattr(cfg, "query_max_terms", None),
                    getattr(cfg, "query_term_buckets", None))
            kf = min(k, cfg.fusion_candidates, dense.n_docs)
            fused = self._build_fused_bucketed(kf)
            with self.timer.stage("encode+cascade", out=lt):
                ids, scores = fused(
                    self.encoder.params, packed,
                    self._lex_dev["indptr"], self._lex_dev["post_docs"],
                    self._lex_dev["post_weights"],
                    dense.bucket_of, dense.row_of, *self._bucketed_flat)
                ids = np.asarray(ids)
                scores = np.asarray(scores)
            self.last_timings = {n: round(v, 6) for n, v in lt.items()}
            return ids, scores
        # flat index: encoder + cascade fused into one dispatch, query
        # token ids + BM25 term ids packed into ONE transfer
        with self.timer.stage("tokenize", out=lt):
            packed = pack_query_batch(
                self.encoder, lex, queries,
                getattr(cfg, "query_max_terms", None),
                getattr(cfg, "query_term_buckets", None))
        prefilter = getattr(cfg, "dense_prefilter", 0)
        kf = min(k, cfg.fusion_candidates, dense.n_docs)
        fused = self._build_fused(kf)
        with self.timer.stage("encode+cascade", out=lt):
            ids, scores = fused(
                self.encoder.params, packed,
                self._lex_dev["indptr"], self._lex_dev["post_docs"],
                self._lex_dev["post_weights"],
                dense.emb_flat, dense.scales, dense.doc_lengths,
                dense.ensure_pooled() if prefilter > 0 else None,
                dense.doc_scales)
            ids = np.asarray(ids)
            scores = np.asarray(scores)
        self.last_timings = {n: round(v, 6) for n, v in lt.items()}
        return ids, scores

    def retrieve(self, query: str, top_k_final: Optional[int] = None
                 ) -> List[Dict]:
        """Single-query API with text fetch — parity with reference
        retrieve() (local_rag_complete.py:894-935)."""
        lt: Dict[str, float] = {}
        ids, scores = self.retrieve_batch([query], top_k_final,
                                          timings_out=lt)
        results: List[Dict] = []
        with self.timer.stage("fetch", out=lt):
            for rank, (cid, score) in enumerate(zip(ids[0], scores[0]), 1):
                if cid < 0:
                    continue
                row = dict(chunk_id=int(cid), score=float(score), rank=rank)
                if self.store is not None:
                    meta = self.store.get_chunk(int(cid))
                    if meta:
                        row.update(meta)
                elif self.indexes.corpus is not None:
                    row["text"] = self.indexes.corpus[int(cid)]
                results.append(row)
        self.last_timings = {n: round(v, 6)
                             for n, v in lt.items()}  # + the fetch stage
        log.debug("retrieve timings: %s", json.dumps(self.last_timings))
        return results
