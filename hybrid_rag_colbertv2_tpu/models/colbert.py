"""ColBERT late-interaction encoder — Flax, jit/pjit-friendly.

The reference loads ``jinaai/jina-colbert-v2`` through sentence-transformers
(local_rag_complete.py:718-724) and — despite the comment at :734 — gets
*pooled* sentence vectors out of ``model.encode``. This module is the real
thing: an XLM-RoBERTa-family transformer emitting **token-level** embeddings,
projected to ``colbert_dim`` (128) and L2-normalized, with ColBERT query/doc
marker tokens and query [MASK]-augmentation.

Architecture notes (Jina-ColBERT-v2 = Jina-XLM-RoBERTa backbone + linear
projection head):
  * standard post-LayerNorm BERT blocks (attention -> add&norm -> GELU MLP
    -> add&norm);
  * position encoding is configurable: ``"learned"`` (XLM-RoBERTa absolute
    embeddings with the RoBERTa pad-offset convention) or ``"rope"``
    (Jina-XLM-RoBERTa rotary attention, which is what lets jina-colbert-v2
    stretch to 8k tokens);
  * projection head ``hidden -> colbert_dim`` with no bias, then L2 norm.

Everything is static-shaped: queries are always ``query_max_tokens`` long
(ColBERT query augmentation pads with [MASK] tokens, which *do* attend and
contribute — that's the algorithm, not an artifact), documents are padded to
a length bucket. The forward is one jitted function per (batch, length)
bucket — trace once, reuse forever.

Weights come from ``convert.py`` (HF torch state_dict -> this param tree) or
random init for self-contained / test use. Fidelity of the conversion is
tested against torch ``XLMRobertaModel`` with random weights
(tests/test_encoder.py) since this container has no network access.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.logging import get_logger

log = get_logger(__name__)


@dataclass(frozen=True)
class ColBERTConfig:
    vocab_size: int = 250002
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 8194
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    colbert_dim: int = 128
    position_embedding: str = "rope"   # "rope" | "learned"
    rope_base: float = 10000.0
    # rotation pairing convention. False = flash-attn / GPT-NeoX style
    # (rotate the two HALVES of the head dim), which is what the
    # jina-xlm-roberta rotary backbone of jina-colbert-v2 uses
    # (rotary_emb_interleaved defaults False in its MHA). True = GPT-J
    # style (rotate even/odd PAIRS).
    rope_interleaved: bool = False
    pad_token_id: int = 1              # RoBERTa convention
    # ColBERT protocol
    query_max_tokens: int = 32
    doc_max_tokens: int = 256
    dtype: Any = jnp.float32
    # > 0: LEXICAL ANCHOR — add a gated per-token-id embedding (a second,
    # (vocab, colbert_dim) table) to the projection output BEFORE the L2
    # norm: e_i = normalize(proj(h_i) + g * A[token_i]), g a learnable
    # scalar initialized to this value. Random ~unit-norm anchor rows are
    # quasi-orthogonal in 128-d, so an exact token match contributes a
    # guaranteed ~g^2/(1+g^2) similarity while different tokens get ~0
    # from the anchor — the exact-match affinity a pretrained ColBERT
    # exhibits, which a small corpus-trained backbone loses to contextual
    # mixing (round-5 diagnosis: 86-89% of dense top-1 misses were
    # sibling chunks sharing the sentence frame; the discriminating slot
    # tokens' contextual embeddings collapse toward their in-frame
    # alternatives). Synonym rows are tied at init like word_embeddings
    # (train/lexicon.py::tie_synonym_embeddings), so the anchor preserves
    # the lexicon prior. 0 = off (pretrained checkpoints — their
    # backbones already carry this behavior; there is no such table in
    # HF weights).
    lexical_anchor: float = 0.0

    @classmethod
    def jina_colbert_v2(cls, **kw) -> "ColBERTConfig":
        """Shape of jinaai/jina-colbert-v2 (560M backbone, 128-d head)."""
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "ColBERTConfig":
        """Small config for tests / self-contained corpora."""
        base = dict(
            vocab_size=1024, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position_embeddings=512,
            colbert_dim=32, position_embedding="learned",
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def small(cls, **kw) -> "ColBERTConfig":
        """Self-contained 'local' encoder: trainable on-corpus, 128-d head."""
        base = dict(
            vocab_size=32768, hidden_size=256, num_layers=4, num_heads=8,
            intermediate_size=1024, max_position_embeddings=1024,
            colbert_dim=128, position_embedding="rope",
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def base(cls, **kw) -> "ColBERTConfig":
        """2x-deeper self-contained encoder (VERDICT r3 next #1b: 'try a
        larger self-contained preset'): 8L x 384H, still corpus-trainable
        in minutes on one chip. All MXU-friendly multiples (384 = 6 x 64
        heads, 1536 MLP)."""
        base = dict(
            vocab_size=32768, hidden_size=384, num_layers=8, num_heads=6,
            intermediate_size=1536, max_position_embeddings=1024,
            colbert_dim=128, position_embedding="rope",
        )
        base.update(kw)
        return cls(**base)


def _rope_cache(seq_len: int, head_dim: int, base: float) -> Tuple[jax.Array, jax.Array]:
    inv = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)                      # (S, head_dim/2)
    return jnp.cos(freqs), jnp.sin(freqs)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
                interleaved: bool = False) -> jax.Array:
    """x: (B, S, H, Dh) — rotary position embedding.

    interleaved=False (flash-attn/GPT-NeoX, the jina-xlm-roberta backbone
    convention): the two HALVES of the head dim form the rotation pairs.
    interleaved=True (GPT-J): even/odd index pairs. Numerical fidelity of
    both is tested against an independent torch reference
    (tests/test_encoder.py::test_rope_fidelity_vs_torch).
    """
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    if interleaved:
        x1 = x[..., 0::2]
        x2 = x[..., 1::2]
        ro1 = x1 * c - x2 * s
        ro2 = x2 * c + x1 * s
        return jnp.stack([ro1, ro2], axis=-1).reshape(x.shape)
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


class SelfAttention(nn.Module):
    cfg: ColBERTConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, s, h = x.shape
        nh = cfg.num_heads
        dh = h // nh
        dense = functools.partial(nn.Dense, dtype=cfg.dtype)
        q = dense(h, name="query")(x).reshape(b, s, nh, dh)
        k = dense(h, name="key")(x).reshape(b, s, nh, dh)
        v = dense(h, name="value")(x).reshape(b, s, nh, dh)
        if cfg.position_embedding == "rope":
            cos, sin = _rope_cache(s, dh, cfg.rope_base)
            q = _apply_rope(q, cos, sin, cfg.rope_interleaved)
            k = _apply_rope(k, cos, sin, cfg.rope_interleaved)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=jnp.float32)
        att = att / np.sqrt(dh)
        bias = jnp.where(mask[:, None, None, :], 0.0, -1e30)
        att = jax.nn.softmax(att + bias, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v,
                         preferred_element_type=jnp.float32)
        out = out.astype(cfg.dtype).reshape(b, s, h)
        return dense(h, name="out")(out)


class EncoderLayer(nn.Module):
    cfg: ColBERTConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        a = SelfAttention(cfg, name="attention")(x, mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="attention_ln")(x + a)
        f = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                     name="intermediate")(x)
        f = nn.gelu(f, approximate=False)
        f = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output")(f)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="output_ln")(x + f)
        return x


class ColBERTModel(nn.Module):
    """Backbone + projection head. Returns L2-normalized token embeddings
    with padding rows zeroed (the invariant ops/maxsim.py relies on)."""

    cfg: ColBERTConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array
                 ) -> jax.Array:
        cfg = self.cfg
        b, s = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                     name="word_embeddings")(input_ids)
        if cfg.position_embedding == "learned":
            # RoBERTa convention: position ids start at pad_token_id + 1
            # and padding positions point at pad_token_id.
            positions = jnp.cumsum(attention_mask.astype(jnp.int32), axis=1)
            positions = positions * attention_mask + cfg.pad_token_id
            x = x + nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                             dtype=cfg.dtype, name="position_embeddings")(
                positions)
        if cfg.type_vocab_size:
            x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                             dtype=cfg.dtype, name="token_type_embeddings")(
                jnp.zeros((b, s), jnp.int32))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="embeddings_ln")(x)
        mask = attention_mask.astype(bool)
        for i in range(cfg.num_layers):
            x = EncoderLayer(cfg, name=f"layer_{i}")(x, mask)
        # ColBERT projection head (no bias, like the official linear layer)
        emb = nn.Dense(cfg.colbert_dim, use_bias=False, dtype=cfg.dtype,
                       name="colbert_linear")(x)
        if cfg.lexical_anchor > 0.0:
            # lexical anchor (see ColBERTConfig.lexical_anchor): the
            # projection output is normalized FIRST so the learnable gate
            # controls the anchor/context mix independent of the
            # backbone's output scale
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            anchor = nn.Embed(
                cfg.vocab_size, cfg.colbert_dim, dtype=cfg.dtype,
                embedding_init=nn.initializers.normal(
                    1.0 / float(np.sqrt(cfg.colbert_dim))),
                name="anchor_embeddings")(input_ids)
            gate = self.param(
                "anchor_gate",
                lambda _rng: jnp.asarray(cfg.lexical_anchor, jnp.float32))
            emb = emb + gate.astype(cfg.dtype) * anchor
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        # zero padding rows: downstream kernels assume padded tokens are 0
        return emb * attention_mask[..., None].astype(emb.dtype)


# ---------------------------------------------------------------------------
# High-level encoder: tokenization + markers + bucketing + jitted forwards
# ---------------------------------------------------------------------------

from ..utils.cache import JitCache

# model -> jitted forward executables, shared across encoder instances
# with equal geometry (ColBERTModel is a frozen flax dataclass, hashable
# by its config). Bounded LRU so abandoned geometries release their
# executables.
_FORWARD_CACHE = JitCache(max_entries=8)


def _jitted_doc_forward(model):
    return _FORWARD_CACHE.get_or_build(("doc", model), lambda: jax.jit(
        lambda p, ids, mask: model.apply({"params": p}, ids, mask)))


def _jitted_query_forward(model):
    # query path: the [MASK]-augmented mask is all-ones, so build it on
    # device — halves the host->device transfers per query batch (each
    # transfer has a fixed cost; on tunneled devices several ms)
    return _FORWARD_CACHE.get_or_build(("query", model), lambda: jax.jit(
        lambda p, ids: model.apply({"params": p}, ids,
                                   jnp.ones_like(ids))))


class ColBERTEncoder:
    """Implements the index-manager's DocEncoder protocol.

    ColBERT protocol (matching the official encoder the reference *meant*
    to use):
      query: [CLS] [Q] q1..qn [SEP] [MASK]... padded to query_max_tokens,
             all positions attend (query augmentation);
      doc:   [CLS] [D] d1..dn [SEP], padded to a length bucket, padding
             masked out.
    """

    def __init__(
        self,
        config: ColBERTConfig,
        tokenizer,                      # models/tokenizer.ColBERTTokenizer
        params: Optional[Dict] = None,
        seed: int = 0,
        doc_batch_size: int = 32,
    ):
        self.cfg = config
        self.tokenizer = tokenizer
        self.model = ColBERTModel(config)
        self.doc_batch_size = doc_batch_size
        if params is None:
            rng = jax.random.PRNGKey(seed)
            shape_ids = jnp.zeros((1, 8), jnp.int32)
            shape_mask = jnp.ones((1, 8), jnp.int32)
            params = self.model.init(rng, shape_ids, shape_mask)["params"]
            log.info("ColBERTEncoder: random-initialized params "
                     "(%d layers, H=%d)", config.num_layers, config.hidden_size)
        self.params = params
        # jitted forwards are memoized MODULE-wide keyed by the model
        # (flax modules hash by geometry): fresh encoder instances over
        # the same architecture — multi-seed training/eval harnesses
        # build several — reuse the compiled executables instead of
        # re-jitting (~20 s per doc-forward compile on a tunneled TPU)
        self._apply = _jitted_doc_forward(self.model)
        self._apply_q = _jitted_query_forward(self.model)

    # -- tokenization ----------------------------------------------------
    def _tokenize_query(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        ids = self.tokenizer.encode_query(text, self.cfg.query_max_tokens)
        mask = np.ones_like(ids)  # augmentation: [MASK] positions attend
        return ids, mask

    def _tokenize_doc(self, text: str, max_len: int
                      ) -> Tuple[np.ndarray, np.ndarray, int]:
        ids, n = self.tokenizer.encode_doc(text, max_len)
        mask = (np.arange(max_len) < n).astype(np.int32)
        return ids, mask, n

    # -- public API -------------------------------------------------------
    def encode_queries(self, texts: Sequence[str]) -> jax.Array:
        """-> (B, Lq, D); every row L2-normalized (no zero rows for queries:
        [MASK] augmentation means all Lq positions are live)."""
        ids = np.stack([self._tokenize_query(t)[0] for t in texts])
        return self._apply_q(self.params, jnp.asarray(ids))

    def encode_docs(self, texts: Sequence[str], doc_len: Optional[int] = None
                    ) -> Tuple[jax.Array, jax.Array]:
        """-> (token_embs (N, L, D), lengths (N,)). Batched + padded."""
        l = doc_len or self.cfg.doc_max_tokens
        all_embs = []
        lengths = []
        bs = self.doc_batch_size
        for i in range(0, len(texts), bs):
            batch = texts[i : i + bs]
            # batch tokenization (tokenizer.encode_docs): parallelizes
            # across host cores where available — tokenization is the
            # indexing bottleneck on natural text, and jax dispatch is
            # async so host tokenize of batch i+1 overlaps device encode
            # of batch i
            ids, ns = self.tokenizer.encode_docs(batch, l)
            mask = (np.arange(l)[None, :] < ns[:, None]).astype(np.int32)
            lengths.extend(int(n) for n in ns)
            # pad the last batch to the full batch size to avoid a recompile
            if len(batch) < bs:
                pad = bs - len(batch)
                ids = np.pad(ids, ((0, pad), (0, 0)),
                             constant_values=self.cfg.pad_token_id)
                mask = np.pad(mask, ((0, pad), (0, 0)))
            embs = self._apply(self.params, jnp.asarray(ids),
                               jnp.asarray(mask))
            all_embs.append(embs[: len(batch)])
        if not all_embs:
            d = self.cfg.colbert_dim
            return jnp.zeros((0, l, d)), jnp.zeros((0,), jnp.int32)
        full = sum(1 for n in lengths if n >= l)
        if full:
            log.warning(
                "%d/%d docs hit the doc token budget (doc_max_tokens=%d) — "
                "the dense index sees only their prefix (BM25 still scores "
                "the full text). Raise doc_max_tokens or lower "
                "max_chunk_size if these are truncated chunks.",
                full, len(texts), l)
        return (
            jnp.concatenate(all_embs, axis=0),
            jnp.asarray(np.array(lengths, np.int32)),
        )

    # -- persistence -------------------------------------------------------
    def save_params(self, path: str) -> None:
        flat = jax.tree_util.tree_map(np.asarray, self.params)
        flat_items = {}

        def rec(prefix, tree):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    rec(f"{prefix}/{k}" if prefix else k, v)
            else:
                flat_items[prefix] = tree

        rec("", flat)
        np.savez(path, **flat_items)

    @staticmethod
    def load_params(path: str) -> Dict:
        arrs = np.load(path)
        tree: Dict = {}
        for key in arrs.files:
            parts = key.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(arrs[key])
        return tree

    def config_dict(self) -> Dict:
        d = dataclasses.asdict(self.cfg)
        d.pop("dtype", None)
        return d
