"""Length-bucketed dense index: several padded sub-indexes, one id space.

SURVEY.md section 7, hard parts: 'Ragged -> padded index layout: variable
chunk token counts vs XLA static shapes — length-bucketing + capacity
padding without wrecking memory'. A single-bucket index pads every document
to the longest bucket (256 tokens by default); most corpora are dominated
by shorter chunks, so bucketing by token count (e.g. 64/128/256) cuts both
HBM footprint and MaxSim scan FLOPs roughly in half on typical mixes.

Each bucket is a standard ``DenseTokenIndex`` over ITS docs plus a
``global_ids`` vector mapping bucket rows back to the one global corpus-id
space. Scores from per-bucket Pallas scans are scattered into the global
(B, N) score matrix; rerank gathers each candidate from its home bucket and
right-pads to the largest bucket length.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.maxsim import maxsim_scores_exact
from .dense import DenseTokenIndex


@dataclass
class BucketedDenseIndex:
    buckets: List[DenseTokenIndex]      # one per length bucket (ascending L)
    # per bucket: (n_pad_b,) int32 corpus ids, -1 in padding rows — padded
    # to the sub-index's doc capacity so the doc axis shards evenly
    # (parallel/mesh.py::shard_bucketed_index)
    global_ids: List[jax.Array]
    bucket_of: jax.Array                # (N,) int32 bucket index per doc
    row_of: jax.Array                   # (N,) int32 row within its bucket
    n_docs: int

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        token_embs: jax.Array,    # (N, L_in, D)
        lengths: jax.Array,       # (N,)
        *,
        bucket_sizes: Sequence[int] = (64, 128, 256),
        dtype: str = "int8",
        docs_pad_multiple: int = 128,
    ) -> "BucketedDenseIndex":
        n = int(lengths.shape[0])
        lengths_np = np.asarray(lengths)
        sizes = sorted(bucket_sizes)
        # assign each doc to the smallest bucket that holds it (docs longer
        # than the largest bucket are truncated into it)
        assign = np.full((n,), len(sizes) - 1, np.int32)
        for bi in reversed(range(len(sizes))):
            assign[lengths_np <= sizes[bi]] = bi

        buckets: List[DenseTokenIndex] = []
        gids: List[jax.Array] = []
        bucket_of = np.zeros((n,), np.int32)
        row_of = np.zeros((n,), np.int32)
        kept: List[int] = []
        for bi, size in enumerate(sizes):
            rows = np.nonzero(assign == bi)[0]
            if rows.size == 0:
                continue
            sub = DenseTokenIndex.build(
                token_embs[jnp.asarray(rows)], lengths[jnp.asarray(rows)],
                doc_len=size, dtype=dtype,
                docs_pad_multiple=docs_pad_multiple)
            bucket_of[rows] = len(buckets)
            row_of[rows] = np.arange(rows.size, dtype=np.int32)
            buckets.append(sub)
            gid = np.full((sub.n_pad,), -1, np.int32)
            gid[: rows.size] = rows.astype(np.int32)
            gids.append(jnp.asarray(gid))
            kept.append(size)
        return cls(
            buckets=buckets,
            global_ids=gids,
            bucket_of=jnp.asarray(bucket_of),
            row_of=jnp.asarray(row_of),
            n_docs=n,
        )

    # ------------------------------------------------------------------
    def append(
        self,
        token_embs: jax.Array,    # (M, L_in, D) new docs' token embeddings
        lengths: jax.Array,       # (M,)
        *,
        bucket_sizes: Sequence[int] = (64, 128, 256),
        docs_pad_multiple: int = 128,
    ) -> "BucketedDenseIndex":
        """Incrementally add documents to the bucketed layout (the flat
        counterpart is DenseTokenIndex.append). Each new doc routes to the
        smallest configured bucket that holds it: existing buckets append
        in place (their embeddings are reused untouched), lengths with no
        existing bucket open a NEW one (appended at the end of the bucket
        list — consumers never assume a size order). Global ids stay
        corpus row order: old docs keep their ids, new docs follow."""
        m = int(lengths.shape[0])
        if m == 0:
            return self
        lengths_np = np.asarray(lengths)
        sizes = sorted(bucket_sizes)
        assign_size = np.full((m,), sizes[-1], np.int64)
        for s in reversed(sizes):
            assign_size[lengths_np <= s] = s

        buckets = list(self.buckets)
        gids = [np.asarray(g) for g in self.global_ids]
        bucket_of = np.concatenate(
            [np.asarray(self.bucket_of), np.zeros((m,), np.int32)])
        row_of = np.concatenate(
            [np.asarray(self.row_of), np.zeros((m,), np.int32)])
        size_to_bucket = {b.doc_len: i for i, b in enumerate(buckets)}
        quant = buckets[0].quant
        for size in sorted(set(assign_size.tolist())):
            rows = np.nonzero(assign_size == size)[0]
            new_gids = (self.n_docs + rows).astype(np.int32)
            sel = jnp.asarray(rows)
            bi = size_to_bucket.get(size)
            if bi is None:
                sub = DenseTokenIndex.build(
                    token_embs[sel], lengths[sel], doc_len=size,
                    dtype=quant, docs_pad_multiple=docs_pad_multiple)
                bi = len(buckets)
                size_to_bucket[size] = bi
                buckets.append(sub)
                gid = np.full((sub.n_pad,), -1, np.int32)
                gid[: rows.size] = new_gids
                gids.append(gid)
                row_of[self.n_docs + rows] = np.arange(rows.size,
                                                       dtype=np.int32)
            else:
                old = buckets[bi]
                sub = old.append(token_embs[sel], lengths[sel],
                                 docs_pad_multiple=docs_pad_multiple)
                buckets[bi] = sub
                gid = np.full((sub.n_pad,), -1, np.int32)
                gid[: old.n_docs] = gids[bi][: old.n_docs]
                gid[old.n_docs: sub.n_docs] = new_gids
                gids[bi] = gid
                row_of[self.n_docs + rows] = old.n_docs + np.arange(
                    rows.size, dtype=np.int32)
            bucket_of[self.n_docs + rows] = bi
        return BucketedDenseIndex(
            buckets=buckets,
            global_ids=[jnp.asarray(g) for g in gids],
            bucket_of=jnp.asarray(bucket_of),
            row_of=jnp.asarray(row_of),
            n_docs=self.n_docs + m,
        )

    # ------------------------------------------------------------------
    @property
    def max_doc_len(self) -> int:
        return max(b.doc_len for b in self.buckets)

    @property
    def is_int8(self) -> bool:
        return self.buckets[0].is_int8

    @property
    def quant(self) -> str:
        return self.buckets[0].quant

    def memory_bytes(self) -> int:
        return sum(b.memory_bytes() for b in self.buckets)

    # ------------------------------------------------------------------
    def search_scores(self, queries: jax.Array) -> jax.Array:
        """(B, Lq, D) -> (B, n_docs): per-bucket Pallas scans scattered into
        the global score matrix."""
        b = queries.shape[0]
        out = jnp.full((b, self.n_docs), -1e30, jnp.float32)
        for sub, gid in zip(self.buckets, self.global_ids):
            s = sub.search_scores(queries)          # (B, n_b)
            out = out.at[:, gid[: sub.n_docs]].set(s)
        return out

    # ------------------------------------------------------------------
    def search_topk(self, queries: jax.Array, k: int, prefilter: int = 0,
                    approx_recall: float = 0.95
                    ) -> Tuple[jax.Array, jax.Array]:
        """(B, Lq, D) -> (scores (B, k), global ids (B, k)); ids < 0 missing.

        Per-bucket top-k (pruned when ``prefilter`` > 0, see
        ops/prefilter.py) merged by a global top-k over the concatenated
        candidates — never materializes the dense (B, N) score matrix.
        Exact merge: each bucket contributes its full-k best, so the global
        best-k is always contained in the union.
        """
        vals_all, ids_all = [], []
        for sub, gid in zip(self.buckets, self.global_ids):
            v, i = sub.search_topk(queries, min(k, sub.n_docs), prefilter,
                                   approx_recall)
            safe = jnp.clip(i, 0, gid.shape[0] - 1)
            g = jnp.where(i >= 0, gid[safe], -1)
            vals_all.append(jnp.where(i >= 0, v, -1e30))
            ids_all.append(g)
        v = jnp.concatenate(vals_all, axis=1)
        g = jnp.concatenate(ids_all, axis=1)
        tv, tp = jax.lax.top_k(v, min(k, v.shape[1]))
        ti = jnp.take_along_axis(g, tp, axis=1)
        return tv, jnp.where(tv > -1e29, ti, -1).astype(jnp.int32)

    # ------------------------------------------------------------------
    def gather_docs(self, ids: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """ids (K,) global -> fp32 (K, L_max, D) + lengths (K,); ids < 0
        give zero-length docs."""
        k = ids.shape[0]
        l_max = self.max_doc_len
        d = self.buckets[0].dim
        safe_ids = jnp.clip(ids, 0, self.n_docs - 1)
        my_bucket = self.bucket_of[safe_ids]            # (K,)
        my_row = self.row_of[safe_ids]
        docs = jnp.zeros((k, l_max, d), jnp.float32)
        lens = jnp.zeros((k,), jnp.int32)
        for bi, sub in enumerate(self.buckets):
            rows = jnp.clip(my_row, 0, sub.n_pad - 1)
            rpd = sub.doc_len // 2 if sub.is_int4 else sub.doc_len
            embs3 = sub.emb_flat.reshape(sub.n_pad, rpd, -1)
            g = embs3[rows]                             # (K, rpd, D) raw
            if sub.is_int4:                             # nibble-packed
                from ..ops.quant import unpack_int4_pairs

                g = unpack_int4_pairs(g)                # (K, L_b, D)
            g = g.astype(jnp.float32)
            if sub.is_int8:
                sc = sub.scales.reshape(sub.n_pad, sub.doc_len)[rows]
                g = g * sc[..., None]
            elif sub.doc_scales is not None and sub.doc_scales.ndim == 2:
                # int4 group scales (G, n_pad) -> per-row (K, L_b);
                # duplicated padding rows are masked by lens
                gsz = sub.doc_len // sub.doc_scales.shape[0]
                sc = jnp.repeat(jnp.transpose(sub.doc_scales[:, rows]),
                                gsz, axis=1)
                g = g * sc[..., None]
            elif sub.doc_scales is not None:
                # "int8-doc": duplicated padding rows are masked by lens
                g = g * sub.doc_scales[rows][:, None, None]
            if sub.doc_len < l_max:
                g = jnp.pad(g, ((0, 0), (0, l_max - sub.doc_len), (0, 0)))
            sel = (my_bucket == bi) & (ids >= 0)
            docs = jnp.where(sel[:, None, None], g, docs)
            lens = jnp.where(sel, sub.doc_lengths[rows], lens)
        return docs, lens

    def rerank_scores(self, queries: jax.Array, ids: jax.Array) -> jax.Array:
        def one(q, cand):
            docs, lens = self.gather_docs(cand)
            return maxsim_scores_exact(q[None], docs, lens)[0]
        return jax.vmap(one)(queries.astype(jnp.float32), ids)

    # ------------------------------------------------------------------
    def convert(self, dtype: str, *, block: int = 4096
                ) -> "BucketedDenseIndex":
        """Requantize every length bucket into another layout without
        re-encoding (DenseTokenIndex.convert per bucket); the routing
        arrays (global_ids/bucket_of/row_of) are layout-independent."""
        return BucketedDenseIndex(
            buckets=[b.convert(dtype, block=block) for b in self.buckets],
            global_ids=self.global_ids, bucket_of=self.bucket_of,
            row_of=self.row_of, n_docs=self.n_docs)

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        for i, (sub, gid) in enumerate(zip(self.buckets, self.global_ids)):
            sub.save(path / f"bucket_{i}")
            np.save(path / f"bucket_{i}" / "global_ids.npy", np.asarray(gid))
        np.savez(path / "mapping.npz", bucket_of=np.asarray(self.bucket_of),
                 row_of=np.asarray(self.row_of))
        (path / "meta.json").write_text(json.dumps({
            "n_docs": self.n_docs, "n_buckets": len(self.buckets)}))
        # Clear the other layout's / a wider save's stale artifacts so a
        # layout switch never leaves a misdetectable mixed directory.
        import shutil

        (path / "dense.npz").unlink(missing_ok=True)
        for sub in path.glob("bucket_*"):
            if sub.is_dir() and not (
                    sub.name.removeprefix("bucket_").isdigit()
                    and int(sub.name.removeprefix("bucket_"))
                    < len(self.buckets)):
                shutil.rmtree(sub)

    @classmethod
    def load(cls, path: str | Path) -> "BucketedDenseIndex":
        path = Path(path)
        meta = json.loads((path / "meta.json").read_text())
        arrs = np.load(path / "mapping.npz")
        buckets, gids = [], []
        for i in range(meta["n_buckets"]):
            sub = DenseTokenIndex.load(path / f"bucket_{i}")
            buckets.append(sub)
            gid = np.load(path / f"bucket_{i}" / "global_ids.npy")
            if gid.size < sub.n_pad:   # pre-padding-era saves
                gid = np.pad(gid, (0, sub.n_pad - gid.size),
                             constant_values=-1)
            gids.append(jnp.asarray(gid))
        return cls(buckets=buckets, global_ids=gids,
                   bucket_of=jnp.asarray(arrs["bucket_of"]),
                   row_of=jnp.asarray(arrs["row_of"]),
                   n_docs=meta["n_docs"])
