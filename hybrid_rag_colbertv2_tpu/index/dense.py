"""Dense ColBERT token-embedding index — HBM-resident, padded, quantizable.

Replaces the reference's ``JinaColBERTRetriever`` index (a raw ``torch.save``
of fp32 pooled vectors + the corpus text, local_rag_complete.py:728-753).
Here the index is the real late-interaction structure: every document's
*token-level* embeddings, padded to a static token count ``doc_len`` (XLA
needs static shapes), stored token-major as ``(N_pad * doc_len, D)`` so the
MaxSim kernel (ops/maxsim.py) streams it through the MXU in large tiles.

Numerics: ``float32`` / ``bfloat16`` store raw embeddings; ``int8`` stores
symmetric absmax-quantized rows + per-token-row fp32 scales (ops/quant.py),
dequantized inside the scoring kernel. 1M chunks x 256 tokens x 128 dim at
int8 is ~33 GB -> sharded over the mesh's doc axis (parallel/).

Unlike the reference, rerank does NOT re-encode candidate texts
(local_rag_complete.py:779-800 re-encodes all 50 candidates per query);
``gather_docs`` pulls the already-indexed embeddings for exact rescoring.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.maxsim import (maxsim_scores, maxsim_scores_exact,
                          maxsim_scores_int4_doc, maxsim_scores_int8,
                          maxsim_scores_int8_doc)
from ..ops.prefilter import maxsim_topk_pruned, pooled_doc_embeddings
from ..ops.quant import (int4_group_size, quantize_int4_groups,
                         quantize_int8_docs, quantize_int8_rows,
                         unpack_int4_pairs)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_bucket(max_len: int, buckets: Sequence[int]) -> int:
    """Smallest configured bucket covering max_len (largest bucket if none)."""
    for b in sorted(buckets):
        if max_len <= b:
            return b
    return max(buckets)


@dataclass
class DenseTokenIndex:
    """Padded token-embedding index over one global doc-id space."""

    emb_flat: jax.Array          # (N_pad * L, D) bf16/f32 or int8
    doc_lengths: jax.Array       # (N_pad,) int32 (0 for padding docs)
    n_docs: int
    doc_len: int                 # L — static padded token count
    dim: int
    scales: Optional[jax.Array] = None  # (N_pad * L,) f32 when int8
    # (N_pad, D) bf16 L2-normalized mean token embeddings — the pruned
    # search's prefilter vectors (ops/prefilter.py). ~L x smaller than the
    # token index; always built, costs N*D*2 bytes.
    pooled: Optional[jax.Array] = None
    # (N_pad,) f32 when dtype="int8-doc": ONE scale per document (coarser
    # quantization, but the exact scan runs ~2x faster because dequant and
    # masking vanish from the kernel's per-sims-element work — see
    # ops/maxsim.py::maxsim_scores_int8_doc). Padded token rows duplicate
    # the doc's first row in this layout (NOT zeros).
    # For dtype="int4-doc" this field instead holds PER-TOKEN-GROUP scales
    # shaped (G, N_pad) f32 with the doc axis MINOR (no 128-lane padding;
    # sharded on axis 1) — 8 token rows per scale by default
    # (ops/quant.py::quantize_int4_groups; recall@10 vs exact was 0.938
    # under per-doc scales, the group grid restores the >=0.99 bar).
    doc_scales: Optional[jax.Array] = None

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        token_embs: jax.Array,    # (N, L_in, D) — padded doc token embeddings
        lengths: jax.Array,       # (N,) int32 true token counts
        *,
        doc_len: int,
        dtype: str = "bfloat16",
        docs_pad_multiple: int = 128,
    ) -> "DenseTokenIndex":
        n, l_in, d = token_embs.shape
        lengths = jnp.minimum(lengths.astype(jnp.int32), doc_len)
        if l_in < doc_len:
            token_embs = jnp.pad(token_embs, ((0, 0), (0, doc_len - l_in), (0, 0)))
        elif l_in > doc_len:
            token_embs = token_embs[:, :doc_len, :]
        # zero out padding token rows so quantization scales are 0 there
        tok = jnp.arange(doc_len, dtype=jnp.int32)
        mask = (tok[None, :] < lengths[:, None]).astype(token_embs.dtype)
        token_embs = token_embs * mask[:, :, None]

        n_pad = _round_up(max(n, 1), docs_pad_multiple)
        if n_pad > n:
            token_embs = jnp.pad(token_embs, ((0, n_pad - n), (0, 0), (0, 0)))
            lengths = jnp.pad(lengths, (0, n_pad - n))

        scales = doc_scales = None
        if dtype == "int8":
            flat, scales = quantize_int8_rows(
                token_embs.reshape(n_pad * doc_len, d))
        elif dtype == "int8-doc":
            flat, doc_scales = quantize_int8_docs(token_embs, lengths)
        elif dtype == "int4-doc":
            # nibble-packed pair-rows: (n_pad * L/2, D) int8, per-token-
            # group scales (G, n_pad) — half the HBM of int8 at full lane
            # width (ops/quant.py::quantize_int4_groups)
            flat, doc_scales = quantize_int4_groups(token_embs, lengths)
        else:
            flat = token_embs.reshape(n_pad * doc_len, d).astype(
                jnp.dtype(dtype))
        pooled = pooled_doc_embeddings(flat, scales, lengths,
                                       doc_len=doc_len,
                                       doc_scales=doc_scales,
                                       packed_int4=(dtype == "int4-doc"))
        return cls(
            emb_flat=flat,
            doc_lengths=lengths,
            n_docs=n,
            doc_len=doc_len,
            dim=d,
            scales=scales,
            pooled=pooled,
            doc_scales=doc_scales,
        )

    # ------------------------------------------------------------------
    @property
    def is_int8(self) -> bool:
        return self.scales is not None

    @property
    def is_int4(self) -> bool:
        """True for the nibble-packed "int4-doc" layout (emb_flat carries
        L/2 full-width pair-rows per doc — token 2j in low nibbles,
        2j+1 in high; ops/quant.py::quantize_int4_groups)."""
        return (self.doc_scales is not None
                and self.emb_flat.shape[0] * 2
                == self.n_pad * self.doc_len)

    @property
    def quant(self) -> str:
        """Index numeric layout: "int8" (per-token-row scales), "int8-doc"
        (per-document scales, fast exact scan), "int4-doc" (nibble-packed,
        per-document scales, half the HBM), or the float dtype name."""
        if self.scales is not None:
            return "int8"
        if self.doc_scales is not None:
            return "int4-doc" if self.is_int4 else "int8-doc"
        return str(self.emb_flat.dtype)

    @property
    def n_pad(self) -> int:
        return self.doc_lengths.shape[0]

    def memory_bytes(self) -> int:
        total = self.emb_flat.size * self.emb_flat.dtype.itemsize
        total += self.doc_lengths.size * 4
        if self.scales is not None:
            total += self.scales.size * 4
        if self.doc_scales is not None:
            total += self.doc_scales.size * 4
        if self.pooled is not None:
            total += self.pooled.size * self.pooled.dtype.itemsize
        return total

    def append(self, token_embs: jax.Array, lengths: jax.Array,
               *, docs_pad_multiple: int = 128) -> "DenseTokenIndex":
        """Incrementally add documents (new capability vs the reference,
        which re-encodes the whole corpus on every upload,
        local_rag_complete.py:728-746). The new docs are quantized into the
        SAME doc_len/dtype layout and concatenated after row ``n_docs``;
        existing embeddings are reused untouched. Global ids stay corpus
        row order: old docs keep their ids, new docs follow."""
        new = DenseTokenIndex.build(
            token_embs, lengths, doc_len=self.doc_len, dtype=self.quant,
            docs_pad_multiple=docs_pad_multiple)
        n1, n2 = self.n_docs, new.n_docs
        ld = self.doc_len
        rpd = ld // 2 if self.is_int4 else ld    # storage rows per doc
        flat = jnp.concatenate(
            [self.emb_flat[: n1 * rpd], new.emb_flat[: n2 * rpd]])
        lens = jnp.concatenate(
            [self.doc_lengths[:n1], new.doc_lengths[:n2]])
        n_pad = _round_up(max(n1 + n2, 1), docs_pad_multiple)
        pad = n_pad - (n1 + n2)
        flat = jnp.pad(flat, ((0, pad * rpd), (0, 0)))
        lens = jnp.pad(lens, (0, pad))
        scales = doc_scales = None
        if self.scales is not None:
            scales = jnp.pad(jnp.concatenate(
                [self.scales[: n1 * ld], new.scales[: n2 * ld]]),
                (0, pad * ld))
        if self.doc_scales is not None:
            if self.doc_scales.ndim == 2:      # int4 group scales (G, N)
                doc_scales = jnp.pad(jnp.concatenate(
                    [self.doc_scales[:, :n1], new.doc_scales[:, :n2]],
                    axis=1), ((0, 0), (0, pad)))
            else:
                doc_scales = jnp.pad(jnp.concatenate(
                    [self.doc_scales[:n1], new.doc_scales[:n2]]), (0, pad))
        pooled = jnp.pad(jnp.concatenate(
            [self.ensure_pooled()[:n1], new.pooled[:n2]]),
            ((0, pad), (0, 0)))
        return DenseTokenIndex(
            emb_flat=flat, doc_lengths=lens, n_docs=n1 + n2,
            doc_len=ld, dim=self.dim, scales=scales, pooled=pooled,
            doc_scales=doc_scales)

    def convert(self, dtype: str, *, block: int = 4096
                ) -> "DenseTokenIndex":
        """Requantize into another layout WITHOUT re-encoding the corpus.

        Re-encoding is the expensive path (the flagship 560M encoder
        indexes ~620 docs/s — half an hour per million chunks); this
        dequantizes and requantizes block-by-block inside ONE
        ``lax.map`` step, so the fp32 working set stays ~``block`` docs
        and a 1M-doc index is converted in seconds without ever
        materializing in fp32. Lossy layouts compose: int8 -> int4-doc
        equals quantize_int4(dequantize_int8(x)), NOT
        quantize_int4(original) — convert from the finest layout you
        still hold. New capability vs the reference, whose only
        migration path is re-encoding everything
        (local_rag_complete.py:728-746)."""
        if dtype == self.quant:
            return self
        n_pad, ld, d = self.n_pad, self.doc_len, self.dim
        rpd = ld // 2 if self.is_int4 else ld
        blk = math.gcd(n_pad, max(1, block))
        nb = n_pad // blk
        embs = self.emb_flat.reshape(nb, blk * rpd, d)
        lens_b = self.doc_lengths.reshape(nb, blk)
        src_scales = (self.scales.reshape(nb, blk * ld)
                      if self.scales is not None else
                      jnp.zeros((nb, 1), jnp.float32))
        if self.doc_scales is None:
            src_dsc = jnp.zeros((nb, 1), jnp.float32)
        elif self.doc_scales.ndim == 2:        # int4 group scales (G, N)
            src_dsc = jnp.transpose(self.doc_scales).reshape(
                nb, blk, self.doc_scales.shape[0])
        else:
            src_dsc = self.doc_scales.reshape(nb, blk)
        tok = jnp.arange(ld, dtype=jnp.int32)

        def one(c):
            e, sc, dsc, ln = c
            if self.is_int4:
                # dsc: (blk, G) group scales -> per-row (blk, L)
                gsz = ld // dsc.shape[-1]
                sc_rows = jnp.repeat(dsc, gsz, axis=-1)
                x = (unpack_int4_pairs(e.reshape(blk, rpd, d))
                     .astype(jnp.float32) * sc_rows[:, :, None])
            elif self.scales is not None:
                x = (e.astype(jnp.float32)
                     * sc[:, None]).reshape(blk, ld, d)
            elif self.doc_scales is not None:
                x = (e.reshape(blk, ld, d).astype(jnp.float32)
                     * dsc[:, None, None])
            else:
                x = e.astype(jnp.float32).reshape(blk, ld, d)
            # duplicated padding rows (doc-scale layouts) go back to
            # zeros so the target layout's padding contract holds
            x = x * (tok[None, :, None] < ln[:, None, None])
            if dtype == "int8":
                q, s = quantize_int8_rows(x.reshape(blk * ld, d))
                return q, s
            if dtype == "int8-doc":
                return quantize_int8_docs(x, ln)
            if dtype == "int4-doc":
                return quantize_int4_groups(x, ln)
            return (x.reshape(blk * ld, d).astype(jnp.dtype(dtype)),
                    jnp.zeros((1,), jnp.float32))

        out, out_s = jax.lax.map(one, (embs, src_scales, src_dsc, lens_b))
        flat = out.reshape(nb * out.shape[1], d)
        scales = doc_scales = None
        if dtype == "int8":
            scales = out_s.reshape(n_pad * ld)
        elif dtype == "int4-doc":
            # per-block (nb, G, blk) group scales -> canonical (G, n_pad)
            doc_scales = jnp.transpose(out_s, (1, 0, 2)).reshape(
                out_s.shape[1], n_pad)
        elif dtype == "int8-doc":
            doc_scales = out_s.reshape(n_pad)
        pooled = pooled_doc_embeddings(
            flat, scales, self.doc_lengths, doc_len=ld,
            doc_scales=doc_scales, packed_int4=(dtype == "int4-doc"))
        return DenseTokenIndex(
            emb_flat=flat, doc_lengths=self.doc_lengths,
            n_docs=self.n_docs, doc_len=ld, dim=d, scales=scales,
            pooled=pooled, doc_scales=doc_scales)

    def ensure_pooled(self) -> jax.Array:
        """Compute (and cache) the prefilter vectors if absent (e.g. an
        index saved before pruned search existed)."""
        if self.pooled is None:
            self.pooled = pooled_doc_embeddings(
                self.emb_flat, self.scales, self.doc_lengths,
                doc_len=self.doc_len, doc_scales=self.doc_scales,
                packed_int4=self.is_int4)
        return self.pooled

    # ------------------------------------------------------------------
    def search_topk(self, queries: jax.Array, k: int, prefilter: int = 0,
                    approx_recall: float = 0.95
                    ) -> Tuple[jax.Array, jax.Array]:
        """(B, Lq, D) -> (scores (B, k), ids (B, k)); ids < 0 = missing.

        ``prefilter`` > 0 enables the two-stage pruned search
        (ops/prefilter.py): pooled-cosine top-``prefilter`` candidates,
        exact MaxSim only on those — O(N*D) instead of O(N*L*D) bytes.
        """
        if prefilter > 0:
            return maxsim_topk_pruned(
                queries, self.emb_flat, self.scales, self.doc_lengths,
                self.ensure_pooled(), doc_scales=self.doc_scales,
                doc_len=self.doc_len,
                n_docs=self.n_docs, n_candidates=prefilter, k=k,
                approx_recall=approx_recall)
        s = self.search_scores(queries)
        vals, ids = jax.lax.top_k(s, min(k, self.n_docs))
        return vals, ids.astype(jnp.int32)

    # ------------------------------------------------------------------
    def search_scores(self, queries: jax.Array) -> jax.Array:
        """(B, Lq, D) query token embeddings -> (B, n_docs) MaxSim scores."""
        if self.is_int4:
            s = maxsim_scores_int4_doc(
                queries, self.emb_flat, self.doc_scales,
                self.doc_lengths, doc_len=self.doc_len,
            )
        elif self.doc_scales is not None:
            s = maxsim_scores_int8_doc(
                queries, self.emb_flat, self.doc_scales,
                self.doc_lengths, doc_len=self.doc_len,
            )
        elif self.is_int8:
            s = maxsim_scores_int8(
                queries, self.emb_flat, self.scales,
                self.doc_lengths, doc_len=self.doc_len,
            )
        else:
            s = maxsim_scores(
                queries, self.emb_flat.astype(jnp.bfloat16),
                self.doc_lengths, doc_len=self.doc_len,
            )
        return s[:, : self.n_docs]

    def gather_docs(self, ids: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Gather (ids…, L, D) fp32 embeddings + lengths for reranking.

        ``ids`` < 0 (missing candidates) are redirected to padding doc slots
        (zero-length -> scores NEG_INF in the rerank, so they never surface).
        """
        safe = jnp.where(ids >= 0, ids, self.n_pad - 1)
        rpd = self.doc_len // 2 if self.is_int4 else self.doc_len
        embs3 = self.emb_flat.reshape(self.n_pad, rpd, -1)
        gathered = embs3[safe]              # packed stays packed here —
        if self.is_int4:                    # gather moves HALF the bytes
            gathered = unpack_int4_pairs(gathered)   # (…, L, D) token order
        gathered = gathered.astype(jnp.float32)
        if self.is_int8:
            sc = self.scales.reshape(self.n_pad, self.doc_len)[safe]
            gathered = gathered * sc[..., None]
        elif self.doc_scales is not None and self.doc_scales.ndim == 2:
            # int4 group scales (G, N): gather per-candidate columns and
            # expand to per-row scales; duplicated padding rows are
            # masked by `lens` downstream
            gsz = self.doc_len // self.doc_scales.shape[0]
            sc = jnp.moveaxis(self.doc_scales[:, safe], 0, -1)  # (…, G)
            gathered = gathered * jnp.repeat(sc, gsz, axis=-1)[..., None]
        elif self.doc_scales is not None:
            # duplicated padding rows are masked by `lens` downstream
            gathered = gathered * self.doc_scales[safe][..., None, None]
        lens = jnp.where(ids >= 0, self.doc_lengths[safe], 0)
        return gathered, lens

    def rerank_scores(self, queries: jax.Array, ids: jax.Array) -> jax.Array:
        """Exact fp32 MaxSim over gathered candidates.

        queries: (B, Lq, D); ids: (B, K) -> (B, K) scores.
        """
        def one(q, cand_ids):
            docs, lens = self.gather_docs(cand_ids)      # (K, L, D), (K,)
            return maxsim_scores_exact(q[None], docs, lens)[0]
        return jax.vmap(one)(queries, ids)

    # ------------------------------------------------------------------
    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        emb_np = np.asarray(self.emb_flat)
        if emb_np.dtype == jnp.bfloat16:
            # npz cannot represent ml_dtypes bfloat16 (it round-trips as
            # raw void and load raises) — persist the raw bits as uint16
            # and re-view on load via meta["emb_dtype"]
            emb_np = emb_np.view(np.uint16)
        arrs = {
            "emb_flat": emb_np,
            "doc_lengths": np.asarray(self.doc_lengths),
        }
        if self.scales is not None:
            arrs["scales"] = np.asarray(self.scales)
        if self.doc_scales is not None:
            arrs["doc_scales"] = np.asarray(self.doc_scales)
        if self.pooled is not None:
            # npz has no bf16; persist prefilter vectors as fp16
            arrs["pooled"] = np.asarray(self.pooled).astype(np.float16)
        np.savez(path / "dense.npz", **arrs)
        meta = {
            "n_docs": self.n_docs,
            "doc_len": self.doc_len,
            "dim": self.dim,
            "dtype": self.quant,
            "emb_dtype": str(np.asarray(self.emb_flat).dtype),
        }
        (path / "meta.json").write_text(json.dumps(meta))
        # A flat save over a previously-bucketed directory must clear the
        # other layout's artifacts — a stale mapping.npz/bucket_* makes
        # loaders misdetect the layout and fail on the flat meta.
        import shutil

        (path / "mapping.npz").unlink(missing_ok=True)
        for sub in path.glob("bucket_*"):
            if sub.is_dir():
                shutil.rmtree(sub)

    @classmethod
    def load(cls, path: str | Path) -> "DenseTokenIndex":
        path = Path(path)
        arrs = np.load(path / "dense.npz")
        meta = json.loads((path / "meta.json").read_text())
        emb_np = arrs["emb_flat"]
        if meta.get("emb_dtype") == "bfloat16":
            import ml_dtypes

            emb_np = emb_np.view(ml_dtypes.bfloat16)
        if emb_np.shape[-1] != meta["dim"] and meta.get(
                "dtype") == "int4-doc":
            raise ValueError(
                "index uses the retired feature-halves int4 layout "
                f"(width {emb_np.shape[-1]} < dim {meta['dim']}) — "
                f"rebuild it from the chunk store ({path})")
        emb = jnp.asarray(emb_np)
        scales = jnp.asarray(arrs["scales"]) if "scales" in arrs else None
        doc_scales = (jnp.asarray(arrs["doc_scales"])
                      if "doc_scales" in arrs else None)
        if (doc_scales is not None and doc_scales.ndim == 1
                and meta.get("dtype") == "int4-doc"):
            # legacy round-4 per-DOC int4 scales: a uniform broadcast over
            # the group axis is EXACT under the group kernel (every padded
            # row duplicates the doc's row 0, whose contribution under any
            # uniform scale equals a valid row's)
            ng = meta["doc_len"] // int4_group_size(meta["doc_len"])
            doc_scales = jnp.tile(doc_scales[None, :], (ng, 1))
        pooled = (jnp.asarray(arrs["pooled"]).astype(jnp.bfloat16)
                  if "pooled" in arrs else None)
        return cls(
            emb_flat=emb,
            doc_lengths=jnp.asarray(arrs["doc_lengths"]),
            n_docs=meta["n_docs"],
            doc_len=meta["doc_len"],
            dim=meta["dim"],
            scales=scales,
            pooled=pooled,
            doc_scales=doc_scales,
        )
