"""Application orchestrator — owns store, encoder, indexes, retriever, chat.

TPU-native equivalent of the reference ``RAGApplication``
(local_rag_complete.py:1111-1238): DB setup, sidecar health check,
``index_documents``, ``initialize_chatbot``, ``chat``, ``interactive_chat``
REPL, ``print_stats``. Differences:

  * indexing REBUILDS both indexes from the full chunk store (the store is
    the source of truth / recovery primitive — SURVEY.md section 5,
    checkpoint/resume), where the reference indexes only the chunks of the
    current call and silently orphans earlier documents;
  * the encoder + tokenizer are persisted next to the index so query-time
    encoding matches index-time encoding across sessions;
  * Ollama is optional: indexing and retrieval never require the sidecar
    (the reference hard-gates indexing on the LLM being up, :1144);
  * with >1 visible device, retrieval automatically shards the dense index
    over the mesh (parallel/).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax

from ..config import RAGConfig
from ..index.manager import IndexManager
from ..ingest.processor import DocumentProcessor
from ..ingest.store import ChunkStore
from ..models.colbert import ColBERTConfig, ColBERTEncoder
from ..models.tokenizer import ColBERTTokenizer
from ..retrieval.cascade import HybridRetriever
from ..utils.logging import get_logger
from .chatbot import RAGChatbot
from .ollama import OllamaClient

log = get_logger(__name__)

_PRESETS = {
    "tiny": ColBERTConfig.tiny,
    "small": ColBERTConfig.small,
    "base": ColBERTConfig.base,
    "jina-colbert-v2": ColBERTConfig.jina_colbert_v2,
}


class RAGApplication:
    def __init__(self, config: Optional[RAGConfig] = None,
                 use_ollama: bool = True):
        self.config = config or RAGConfig()
        self.config.validate()
        self.store = ChunkStore(self.config.db_path)
        self.ollama = OllamaClient(self.config) if use_ollama else None
        self.processor = DocumentProcessor(
            self.config, self.store, vision_client=self.ollama)
        self.encoder: Optional[ColBERTEncoder] = None
        self.indexes: Optional[IndexManager] = None
        self.retriever: Optional[HybridRetriever] = None
        self.chatbot: Optional[RAGChatbot] = None
        self.fusion_gate: Optional[Dict] = None   # measured-gate details
        self._gate_resolved = False   # True when THIS app resolved "auto"

    # ------------------------------------------------------------------
    def check_ollama(self) -> bool:
        return self.ollama.is_alive() if self.ollama else False

    # ------------------------------------------------------------------
    def _encoder_paths(self):
        base = Path(self.config.colbert_index_path)
        return base / "encoder_params.npz", base / "encoder_config.json"

    def _make_encoder(self, corpus: Sequence[str]) -> ColBERTEncoder:
        """Build (or load) tokenizer + encoder, persisted with the index.

        With ``encoder_checkpoint`` pointing at a local HF checkpoint dir
        (e.g. a downloaded jinaai/jina-colbert-v2), everything comes from
        the checkpoint: the tokenizer (its tokenizer.json — vocab ids MUST
        match the embedding table), the geometry/rotary settings (its
        config.json via models/convert.colbert_config_from_hf), and the
        weights (convert_hf_dir, both vanilla and rotary-flash namings).
        Otherwise: self-contained mode — corpus-trained BPE + preset
        geometry + random init (optionally ICT-trained)."""
        cfg = self.config
        import jax.numpy as jnp

        ckpt = Path(cfg.encoder_checkpoint) if cfg.encoder_checkpoint \
            else None
        tokenizer = None
        if ckpt is not None:
            if not (ckpt / "tokenizer.json").exists():
                # pairing a corpus BPE with the checkpoint's embedding
                # table would index arbitrary rows of a foreign vocab —
                # silent garbage rankings. Fail loudly instead.
                raise FileNotFoundError(
                    f"encoder_checkpoint {ckpt} has no tokenizer.json; "
                    "checkpoint weights require the checkpoint's own "
                    "tokenizer (vocab ids must match its embedding table)")
            tokenizer = ColBERTTokenizer.load(ckpt / "tokenizer.json")
            log.info("Tokenizer loaded from checkpoint %s (vocab %d)",
                     ckpt, tokenizer.vocab_size)
        if tokenizer is None:
            tok_path = Path(cfg.tokenizer_path)
            if tok_path.exists():
                tokenizer = ColBERTTokenizer.load(tok_path)
            else:
                # extend BPE training with the synonym lexicon so synonym
                # words ("60", "rapid") get whole tokens instead of byte
                # fallbacks — queries phrased with synonyms then tokenize
                # comparably to corpus prose (train/lexicon.py)
                from ..train.lexicon import lexicon_sentences
                tokenizer = ColBERTTokenizer.train_bpe(
                    (list(corpus) + lexicon_sentences()) if corpus
                    else ["placeholder corpus"],
                    vocab_size=cfg.tokenizer_vocab_size,
                    fold_numeric=cfg.tokenizer_fold_numeric)
                if corpus:
                    # never persist a placeholder-trained tokenizer: an
                    # indexes dir seeded by a pre-upload --query/--chat
                    # would pin byte-level-pieces tokenization for every
                    # later real upload
                    tokenizer.save(tok_path)

        enc_dtype = jnp.dtype(getattr(cfg, "encoder_dtype", "float32"))
        enc_cfg = None
        if ckpt is not None and (ckpt / "config.json").exists():
            from ..models.convert import colbert_config_from_hf
            enc_cfg = colbert_config_from_hf(
                str(ckpt),
                query_max_tokens=cfg.query_max_tokens,
                doc_max_tokens=cfg.doc_max_tokens,
                dtype=enc_dtype,
            )
            log.info("Encoder geometry from checkpoint config.json: "
                     "%dL H=%d %s", enc_cfg.num_layers, enc_cfg.hidden_size,
                     enc_cfg.position_embedding)
        if enc_cfg is None:
            enc_cfg = _PRESETS[cfg.encoder_preset](
                vocab_size=max(tokenizer.vocab_size, 8),
                query_max_tokens=cfg.query_max_tokens,
                doc_max_tokens=cfg.doc_max_tokens,
                # activations dtype; params stay fp32. bf16 roughly doubles
                # MXU throughput for corpus encoding (the indexing hot loop)
                dtype=enc_dtype,
                # self-contained encoders only: guaranteed exact-token-match
                # affinity (see config.encoder_lexical_anchor). A
                # checkpoint WITHOUT config.json also lands here — its
                # converted params carry no anchor table, so defining the
                # anchor in the module would crash the first apply
                # (ScopeParamNotFoundError); honor the documented
                # "ignored when encoder_checkpoint is set" contract.
                lexical_anchor=(0.0 if ckpt is not None
                                else cfg.encoder_lexical_anchor),
            )
        params = None
        if ckpt is not None:
            import dataclasses as _dc

            from ..models.convert import convert_hf_dir
            params = convert_hf_dir(str(ckpt), enc_cfg)
            if "colbert_linear" in params:
                # the projection head's true output dim wins over the
                # config default (config.json describes the backbone only)
                dim = int(params["colbert_linear"]["kernel"].shape[1])
                if dim != enc_cfg.colbert_dim:
                    enc_cfg = _dc.replace(enc_cfg, colbert_dim=dim)
            if "colbert_linear" not in params:
                # backbone-only checkpoint: random projection head (the
                # backbone still carries the semantics; the head is a
                # random rotation of it)
                import jax
                rng = jax.random.PRNGKey(cfg.encoder_seed)
                params["colbert_linear"] = {"kernel": 0.02 * jax.random.normal(
                    rng, (enc_cfg.hidden_size, enc_cfg.colbert_dim))}
                log.warning("checkpoint has no projection head — "
                            "random-initialized colbert_linear")
            log.info("Encoder weights converted from %s", ckpt)
        params_path, cfg_path = self._encoder_paths()
        if params is None and params_path.exists():
            params = ColBERTEncoder.load_params(str(params_path))
        fresh_init = params is None
        encoder = ColBERTEncoder(enc_cfg, tokenizer, params=params,
                                 seed=cfg.encoder_seed)
        if fresh_init and not ckpt:
            # self-contained mode: seed the semantic prior a pretrained
            # checkpoint carries — synonym token pairs ("sixty"/"60")
            # start with IDENTICAL embedding rows; ICT training refines
            # (train/lexicon.py::tie_synonym_embeddings)
            from ..train.lexicon import tie_synonym_embeddings
            tied = tie_synonym_embeddings(encoder.params, tokenizer)
            if tied:
                log.info("synonym-tied %d embedding rows at init", tied)
        if corpus and not params_path.exists():
            # persist only alongside a real corpus (see tokenizer note)
            params_path.parent.mkdir(parents=True, exist_ok=True)
            encoder.save_params(str(params_path))
            cfg_path.write_text(json.dumps(encoder.config_dict()))
        return encoder

    # ------------------------------------------------------------------
    def index_documents(self, paths: Sequence[str]) -> Dict:
        """Process documents then rebuild both indexes from the full store.

        Reference: index_documents (local_rag_complete.py:1141-1164)."""
        n_chunks_before = self.store.stats()["chunks"]
        results = []
        for p in paths:
            chunks, doc_id, ids = self.processor.process_document(p)
            results.append({"path": str(p), "document_id": doc_id,
                            "chunks": len(chunks)})
        corpus = self.store.all_chunk_texts()
        if not corpus:
            raise RuntimeError("no chunks to index")
        self.encoder = self._make_encoder(corpus)
        trains = self._should_train(corpus)
        if trains:
            self._train_encoder(corpus)
        self.indexes = IndexManager(self.config, self.encoder)
        if self.indexes.is_built() and not trains:
            # incremental (flat AND bucketed layouts): reuse persisted
            # embeddings, encode only new chunks (tokenizer + encoder
            # params are persisted with the index, so old and new
            # embeddings share one encoder)
            self.indexes.load()
            self.indexes.add_documents(corpus)
        else:
            self.indexes.build_all(corpus)
        # the index (and possibly the encoder) changed: a previously
        # measured fusion-gate verdict no longer describes it — drop the
        # persisted verdict and re-arm "auto" IF the gate (not the user)
        # chose the current mode, so the next bind re-measures. A NO-OP
        # upload (zero new chunks, no retrain — e.g. re-pointing at an
        # already-ingested directory) leaves the index identical, so the
        # verdict still describes it; invalidating would re-trigger the
        # full gate measurement (~5 cascade compiles + ~40 retrieval
        # dispatches through the tunnel) for nothing (ADVICE r3).
        index_changed = (len(corpus) != n_chunks_before) or trains
        if index_changed:
            self._gate_path().unlink(missing_ok=True)
            if self._gate_resolved:
                self.config.final_fusion = "auto"
                self._gate_resolved = False
                self.fusion_gate = None
        # a live retriever/chatbot would keep serving the PREVIOUS index —
        # rebind them to the freshly built one (no disk reload; preserves
        # an initialized chat session across re-indexing)
        if self.retriever is not None or self.chatbot is not None:
            self._bind_retriever(getattr(self, "_use_mesh", None))
        log.info("Indexed %d documents (%d chunks total)",
                 len(paths), len(corpus))
        return {"documents": results, "total_chunks": len(corpus),
                "timings": dict(self.indexes.timer.timings)}

    # below this, ICT pairs are too few/noisy for auto-training to help
    # (config.encoder_word_dropout note; explicit steps > 0 still train)
    MIN_AUTO_TRAIN_CHUNKS = 16
    AUTO_TRAIN_STEPS = 300

    def _trained_marker_path(self) -> Path:
        return Path(self.config.colbert_index_path) / "encoder_trained.json"

    def _should_train(self, corpus) -> bool:
        """encoder_train_steps semantics: >0 always train, 0 never, -1
        AUTO — train once per index (marker-gated) on corpora large
        enough for ICT pairs to carry signal. A checkpoint always wins
        (its pretrained semantics are strictly better than corpus ICT)."""
        cfg = self.config
        if cfg.encoder_checkpoint:
            return False
        if cfg.encoder_train_steps > 0:
            return True
        if cfg.encoder_train_steps == 0:
            return False
        return (len(corpus) >= self.MIN_AUTO_TRAIN_CHUNKS
                and not self._trained_marker_path().exists())

    def _train_encoder(self, corpus) -> None:
        """Self-contained semantic adaptation: contrastive training on ICT
        pseudo-queries from the corpus (new capability vs the reference,
        whose quality is fixed by the downloaded checkpoint)."""
        from ..train.data import mine_hard_negatives, pseudo_query_pairs
        from ..train.trainer import ColBERTTrainer, TrainConfig

        steps = self.config.encoder_train_steps
        if steps < 0:
            steps = self.AUTO_TRAIN_STEPS
        # 6 pairs/doc measured +1.5pp dense hit@10 over 4 at equal wall
        # time (docs/performance.md ablation); 8 adds nothing further.
        # word_dropout makes training queries non-verbatim — the encoder
        # must rank under partial lexical overlap (the paraphrase-query
        # regime), not memorize exact spans. Disabled on tiny corpora
        # (config.encoder_word_dropout note).
        dropout = (self.config.encoder_word_dropout
                   if len(corpus) >= 16 else 0.0)
        pairs_idx = pseudo_query_pairs(corpus, n_pairs_per_doc=6,
                                       seed=self.config.encoder_seed,
                                       word_dropout=dropout)
        # synonym-augmented share: spans with lexicon-covered words
        # replaced by synonyms (train/lexicon.py) teach the invariance a
        # pretrained encoder has built in — queries phrased with "60" /
        # "rapid" must still rank the chunk saying "sixty" / "fast"
        # first. This is the training half of VERDICT r3 next #1; the
        # adversarial eval slice (tools/sample_corpus.adversarial_pairs)
        # is the measurement half.
        syn_prob = (self.config.encoder_synonym_prob
                    if len(corpus) >= 16 else 0.0)
        if syn_prob > 0.0:
            # longer spans than the base share: real paraphrase queries
            # run ~15-20 words, and an encoder trained only on 3-8 word
            # spans under-ranks them (query-length distribution match)
            # with_mine_text: hard negatives for substituted queries are
            # mined on the ORIGINAL span (the substituted text has no
            # lexical anchors, so mining on it degenerates to random)
            pairs_idx += pseudo_query_pairs(
                corpus, n_pairs_per_doc=self.config.encoder_synonym_pairs,
                seed=self.config.encoder_seed + 1,
                query_words=(4, 14),
                word_dropout=dropout, synonym_prob=syn_prob,
                with_mine_text=True)
        # compositional-rewording share (round 5): shuffled bag-of-
        # content-word queries with rarity-aware dropout of corpus-
        # common words (train/data.py::reworded_query_pairs) — trains
        # the sibling-chunk discrimination the template-paraphrase
        # regime measures (rare anchors under order invariance), which
        # verbatim/dropout spans cannot teach. Mining text is the
        # longest verbatim source span (shuffled text mines randomly).
        n_rw = (self.config.encoder_reworded_pairs
                if len(corpus) >= 16 else 0)
        if n_rw > 0:
            from ..train.data import reworded_query_pairs
            pairs_idx += reworded_query_pairs(
                corpus, n_pairs_per_doc=n_rw,
                seed=self.config.encoder_seed + 2,
                synonym_prob=min(0.15, syn_prob),
                with_mine_text=True)
        # interrogative-framed share (round 5/6): the reworded queries
        # wrapped in question scaffolding — matches the natural-question
        # token distribution the hand-written-questions slice measures
        # (train/data.py::question_query_pairs docstring has the data)
        n_qq = (self.config.encoder_question_pairs
                if len(corpus) >= 16 else 0)
        if n_qq > 0:
            from ..train.data import question_query_pairs
            pairs_idx += question_query_pairs(
                corpus, n_pairs_per_doc=n_qq,
                seed=self.config.encoder_seed + 3,
                synonym_prob=min(0.15, syn_prob),
                with_mine_text=True)
        if syn_prob > 0.0 or n_rw > 0 or n_qq > 0:
            import numpy as _np
            _np.random.default_rng(
                self.config.encoder_seed).shuffle(pairs_idx)
        n_neg = self.config.encoder_hard_negatives
        if n_neg > 0 and len(corpus) > n_neg + 1:
            mined = mine_hard_negatives(corpus, pairs_idx,
                                        n_negatives=n_neg,
                                        seed=self.config.encoder_seed)
            pairs = [(q, corpus[i], [corpus[j] for j in negs])
                     for q, i, negs in mined]
        else:
            pairs = [(p[0], corpus[p[1]]) for p in pairs_idx]
        # batch must not exceed the number of distinct docs — in-batch
        # negatives with duplicated positives make the labels ambiguous
        bs = max(2, min(16, len(corpus)))
        # cap effective epochs: a fresh encoder already ranks by exact
        # token overlap (shared tokens share embeddings); moderate
        # contrastive training adds semantics, but overtraining tiny
        # corpora collapses the representation into per-batch clusters and
        # destroys that lexical prior (measured: a 3-doc corpus ranks 3/3
        # at ~6 epochs, 0-1/3 at 30+ epochs)
        max_epochs = self.config.encoder_max_epochs
        steps = min(steps, max(1, -(-max_epochs * len(pairs) // bs)))
        lr = self.config.encoder_learning_rate
        if lr <= 0.0:
            # auto by preset depth: the 8L base preset diverges at small's
            # 3e-4 (loss flat at ln(batch), acc 0 — r4 sweep), standard
            # depth-scaled-LR behavior for transformers
            lr = 1e-4 if self.encoder.cfg.num_layers >= 8 else 3e-4
        tie_weight = self.config.encoder_tie_weight
        tie_pairs = None
        if tie_weight > 0.0 and syn_prob > 0.0:
            from ..train.lexicon import synonym_tie_pairs
            tp = synonym_tie_pairs(self.encoder.tokenizer,
                                   self.encoder.cfg.vocab_size)
            tie_pairs = tuple(tp) if tp else None
        trainer = ColBERTTrainer(
            self.encoder,
            TrainConfig(steps=steps, batch_size=bs, learning_rate=lr,
                        doc_len=min(self.config.doc_max_tokens, 128),
                        tie_weight=tie_weight if tie_pairs else 0.0,
                        tie_pairs=tie_pairs),
        )
        metrics = trainer.train(pairs)
        if not metrics:
            log.warning("encoder training produced no batches — skipped")
            return
        log.info("encoder trained %d steps: loss %.3f -> %.3f", steps,
                 metrics[0]["loss"], metrics[-1]["loss"])
        # persist the trained weights so query-time encoding matches, and
        # a marker so AUTO mode trains once per index (incremental uploads
        # reuse the trained weights instead of retraining)
        params_path, _ = self._encoder_paths()
        params_path.parent.mkdir(parents=True, exist_ok=True)
        self.encoder.save_params(str(params_path))
        self._trained_marker_path().write_text(json.dumps({
            "steps": steps, "pairs": len(pairs),
            "final_loss": round(metrics[-1]["loss"], 4),
            "chunks": len(corpus)}))

    # ------------------------------------------------------------------
    def convert_index(self, dtype: str) -> Dict:
        """Requantize the persisted dense index into another layout
        WITHOUT re-encoding the corpus (DenseTokenIndex.convert /
        BucketedDenseIndex.convert) and persist it. New capability vs
        the reference, whose only migration path is re-encoding
        everything (local_rag_complete.py:728-746).

        The persisted fusion-gate verdict is dropped: the dense leg's
        quality changes with the quantization grid, so a verdict
        measured on the old layout no longer binds — ``final_fusion=
        "auto"`` re-measures on the next bind. Subsequent incremental
        uploads follow the converted layout (append keys off the stored
        index's quant, not the config)."""
        corpus = self.store.all_chunk_texts()
        self.encoder = self._make_encoder(corpus)
        self.indexes = IndexManager(self.config, self.encoder)
        if not self.indexes.is_built():
            raise RuntimeError(
                "nothing to convert: upload documents first (--upload)")
        self.indexes.load()
        before = self.indexes.dense.quant
        self.indexes.dense = self.indexes.dense.convert(dtype)
        self.indexes.dense.save(self.config.colbert_index_path)
        self.config.mesh.index_dtype = dtype
        self._gate_path().unlink(missing_ok=True)
        if self._gate_resolved:
            self.config.final_fusion = "auto"
            self._gate_resolved = False
            self.fusion_gate = None
        if self.retriever is not None or self.chatbot is not None:
            self._bind_retriever(getattr(self, "_use_mesh", None))
        log.info("Converted dense index: %s -> %s (%d docs)",
                 before, dtype, self.indexes.dense.n_docs)
        return {"from": before, "to": dtype,
                "docs": self.indexes.dense.n_docs}

    def initialize_chatbot(self, use_mesh: Optional[bool] = None) -> None:
        """Load persisted indexes + encoder and stand up the retriever.

        Reference: initialize_chatbot (local_rag_complete.py:1166-1180)."""
        corpus = self.store.all_chunk_texts()
        self.encoder = self._make_encoder(corpus)
        self.indexes = IndexManager(self.config, self.encoder)
        if self.indexes.is_built():
            self.indexes.load()
        elif corpus:
            log.info("Indexes missing — rebuilding from the chunk store")
            self.indexes.build_all(corpus)
        else:
            raise RuntimeError(
                "nothing indexed: upload documents first (--upload)")

        self._use_mesh = use_mesh       # remembered for re-index rebinds
        self._bind_retriever(use_mesh)

    def _gate_path(self) -> Path:
        return Path(self.config.colbert_index_path) / "fusion_gate.json"

    def _gate_config_fp(self) -> Dict:
        """Retrieval-relevant config fingerprint the gate measurement
        depends on: a persisted verdict is only valid for the SAME
        cascade shape (a different prefilter/candidate depth/rrf_k
        changes the measured landscape)."""
        cfg = self.config
        return {k: getattr(cfg, k) for k in (
            "dense_prefilter", "bm25_top_k", "colbert_top_k",
            "fusion_candidates", "final_top_k", "rrf_k",
            "approx_topk_recall", "bm25_postings_cap", "query_max_terms")}

    def resolve_final_fusion(self) -> str:
        """Resolve ``final_fusion="auto"`` via the measured gate
        (retrieval/gate.py): evaluate the (mode, leg-weight) menu on
        held-out pseudo-queries over the indexed corpus, keep the winner,
        and record the measurement in ``self.fusion_gate``.

        The verdict is PERSISTED next to the dense index
        (fusion_gate.json) and reloaded by later processes serving the
        same index — the gate's per-entry compiles + retrievals run once
        per index build, not once per process (re-indexing invalidates
        the file, see index_documents). A user-pinned
        ``fusion_weight_bm25`` (fusion_weight_pinned) restricts the gate
        to the ordering mode only."""
        cfg = self.config
        if cfg.final_fusion != "auto":
            return cfg.final_fusion
        gp = self._gate_path()
        n_chunks = self.store.stats().get("chunks", 0)
        if gp.exists():
            try:
                saved = json.loads(gp.read_text())
                det = saved["details"]
                mode, weight = det["picked"], det["picked_weight"]
                if mode not in ("rerank", "rrf") or not (
                        isinstance(weight, (int, float))
                        and not isinstance(weight, bool)
                        and 0.0 <= weight <= 1.0):
                    raise ValueError(f"invalid verdict {mode!r}/{weight!r}")
                # a verdict from a PINNED run (restricted menu) must not
                # serve an unpinned process (which promises the full
                # menu), and vice versa
                pin_now = (cfg.fusion_weight_bm25
                           if cfg.fusion_weight_pinned else None)
                same_pin = saved.get("pinned_weight") == pin_now
                same_cfg = saved.get("config_fp") == self._gate_config_fp()
                if (saved.get("n_chunks") == n_chunks and same_pin
                        and same_cfg):
                    cfg.final_fusion = mode
                    cfg.fusion_weight_bm25 = weight
                    self.fusion_gate = det
                    self._gate_resolved = True
                    log.info("final_fusion (%r, w=%s) loaded from "
                             "persisted gate verdict", mode, weight)
                    return mode
            except Exception as e:           # corrupt file -> re-measure
                log.warning("ignoring persisted gate verdict: %s", e)
        from ..retrieval.gate import resolve_final_fusion as _gate

        corpus = self.store.all_chunk_texts()
        fixed = cfg.fusion_weight_bm25 if cfg.fusion_weight_pinned else None
        (mode, weight), self.fusion_gate = _gate(
            cfg, self.indexes, self.encoder, corpus,
            chunk_store=self.store, fixed_weight=fixed,
            n_queries=getattr(cfg, "gate_queries", 160))
        cfg.final_fusion = mode
        cfg.fusion_weight_bm25 = weight
        self._gate_resolved = True
        try:
            gp.parent.mkdir(parents=True, exist_ok=True)
            gp.write_text(json.dumps({
                "n_chunks": n_chunks,
                "pinned_weight": fixed,
                "config_fp": self._gate_config_fp(),
                "details": self.fusion_gate}))
        except OSError as e:
            log.warning("could not persist gate verdict: %s", e)
        log.info("final_fusion resolved to (%r, bm25_weight=%s) by "
                 "measured gate", mode, weight)
        return mode

    def _bind_retriever(self, use_mesh: Optional[bool] = None) -> None:
        """Stand up retriever + chatbot over the CURRENT self.indexes
        (no disk reload)."""
        from ..index.bucketed import BucketedDenseIndex as _BDI
        from ..index.dense import DenseTokenIndex as _DTI

        if self.config.final_fusion == "auto":
            self.resolve_final_fusion()

        n_dev = len(jax.devices())
        if use_mesh is None:
            use_mesh = n_dev > 1
        if use_mesh and n_dev > 1:
            from ..parallel.mesh import (make_mesh, shard_bucketed_index,
                                         shard_dense_index)
            from ..parallel.sharded import (ShardedBucketedRetriever,
                                            ShardedRetriever)
            mesh = make_mesh(self.config.mesh)
            n_shards = mesh.shape[self.config.mesh.axis_names[0]]
            subs = (self.indexes.dense.buckets
                    if isinstance(self.indexes.dense, _BDI)
                    else [self.indexes.dense])
            if any(b.n_pad % n_shards for b in subs):
                # index builders pad docs to multiples of 128, which
                # divides any power-of-two shard count <= 128 — but a
                # non-power-of-two mesh (e.g. 6 devices) would crash the
                # sharders; serve single-device instead of failing
                log.warning(
                    "index padding not divisible by %d shards; "
                    "falling back to single-device retrieval", n_shards)
                use_mesh = False
        if use_mesh and n_dev > 1:
            if isinstance(self.indexes.dense, _BDI):
                bucketed = shard_bucketed_index(self.indexes.dense, mesh)
                sharded = ShardedBucketedRetriever(
                    self.config, mesh, self.indexes.lexical, bucketed,
                    self.encoder, chunk_store=self.store)
            else:
                assert isinstance(self.indexes.dense, _DTI)
                dense = shard_dense_index(self.indexes.dense, mesh)
                sharded = ShardedRetriever(
                    self.config, mesh, self.indexes.lexical, dense,
                    self.encoder, chunk_store=self.store)
            self.retriever = _ShardedAdapter(sharded, self.store,
                                             self.config)
            log.info("Sharded retriever over %s mesh", dict(mesh.shape))
        else:
            self.retriever = HybridRetriever(
                self.config, self.indexes, self.encoder,
                chunk_store=self.store)
        history = (self.chatbot.conversation_history
                   if self.chatbot is not None else [])
        self.chatbot = RAGChatbot(self.config, self.retriever, self.ollama)
        self.chatbot.conversation_history = history

    # ------------------------------------------------------------------
    def chat(self, query: str, generate: bool = True) -> Dict:
        if self.chatbot is None:
            raise RuntimeError(
                "Chatbot not initialized. Call initialize_chatbot() first.")
        return self.chatbot.chat(query, generate=generate)

    def query(self, query: str, top_k: Optional[int] = None) -> List[Dict]:
        """Retrieval-only API (new vs reference: --query without an LLM)."""
        if self.retriever is None:
            self.initialize_chatbot()
        return self.retriever.retrieve(query, top_k)

    def query_batch(self, queries: Sequence[str],
                    top_k: Optional[int] = None) -> List[List[Dict]]:
        """Batched retrieval: one device dispatch for many queries (the
        serving layer's micro-batcher rides this)."""
        if self.retriever is None:
            self.initialize_chatbot()
        ids, scores = self.retriever.retrieve_batch(list(queries), top_k)
        # ONE batched IN-fetch for all results across the whole batch (the
        # per-id loop re-created the reference's N+1 SELECT pattern on the
        # serving hot path; ingest/store.py exists to avoid it)
        all_ids = {int(c) for b in range(ids.shape[0])
                   for c in ids[b] if c >= 0}
        meta_by_id = {m["chunk_id"]: m
                      for m in self.store.get_chunks(all_ids)}
        out: List[List[Dict]] = []
        for b in range(ids.shape[0]):
            rows = []
            for rank, (cid, score) in enumerate(
                    zip(ids[b], scores[b]), 1):
                if cid < 0:
                    continue
                row = dict(chunk_id=int(cid), score=float(score), rank=rank)
                meta = meta_by_id.get(int(cid))
                if meta:
                    row.update(meta)
                rows.append(row)
            out.append(rows)
        return out

    # ------------------------------------------------------------------
    def interactive_chat(self) -> None:
        """REPL parity with local_rag_complete.py:1189-1227."""
        print("=" * 60)
        print("RAG Chatbot - Interactive Mode")
        print("=" * 60)
        print("Type your questions ('exit' to quit, 'clear' to reset "
              "history)\n")
        gen = self.check_ollama()
        if not gen:
            print("(LLM sidecar not reachable — retrieval-only answers)\n")
        while True:
            try:
                user_input = input("You: ").strip()
                if not user_input:
                    continue
                if user_input.lower() in ("exit", "quit"):
                    print("\nGoodbye!")
                    break
                if user_input.lower() == "clear":
                    self.chatbot.clear_history()
                    continue
                result = self.chat(user_input, generate=gen)
                if result["response"]:
                    print(f"\nAssistant: {result['response']}\n")
                if result["sources"]:
                    print(f"Sources ({len(result['sources'])}):")
                    for src in result["sources"][:3]:
                        heading = f" - {src['heading']}" if src["heading"] else ""
                        images = " [img]" if src["has_images"] else ""
                        print(f"  * Source {src['source_id']}{heading}{images}"
                              f" (score {src['score']:.3f})")
                    print()
            except (KeyboardInterrupt, EOFError):
                print("\n\nGoodbye!")
                break
            except Exception as e:
                print(f"\nError: {e}\n")

    # ------------------------------------------------------------------
    def stats(self) -> Dict:
        """Reference print_stats (local_rag_complete.py:1229-1238)."""
        s = self.store.stats()
        s["indexes_built"] = bool(
            self.indexes.is_built() if self.indexes
            else IndexManager(self.config).is_built())
        s["devices"] = [str(d) for d in jax.devices()]
        s["final_fusion"] = self.config.final_fusion
        if self.fusion_gate is not None:
            s["fusion_gate"] = self.fusion_gate   # measured calibration
        lt = getattr(self.retriever, "last_timings", None)
        if lt:
            # per-call stage split of the most recent retrieve (the
            # reference prints BM25/dense/fusion/fetch wall-clock per
            # query, local_rag_complete.py:901-933; the fused one-
            # dispatch design collapses those to tokenize / device
            # dispatch / fetch)
            s["last_query_timings"] = lt
        return s

    def print_stats(self) -> None:
        s = self.stats()
        print("\nDatabase Statistics:")
        print(f"   * Documents: {s['documents']}")
        print(f"   * Chunks: {s['chunks']}")
        print(f"   * Images: {s['images']}")
        print(f"   * Indexes built: {s['indexes_built']}")
        print(f"   * Devices: {', '.join(s['devices'])}")


class _ShardedAdapter:
    """Gives ShardedRetriever the single-query retrieve() surface."""

    def __init__(self, sharded, store, config):
        self._r = sharded
        self._store = store
        self._cfg = config

    def retrieve(self, query: str, top_k: Optional[int] = None) -> List[Dict]:
        ids, scores = self._r.retrieve_batch([query], top_k)
        out = []
        rows = self._store.get_chunks([int(i) for i in ids[0] if i >= 0])
        by_id = {r["chunk_id"]: r for r in rows}
        rank = 0
        for cid, score in zip(ids[0], scores[0]):
            if cid < 0:
                continue
            rank += 1
            row = dict(by_id.get(int(cid), {"chunk_id": int(cid)}))
            row.update(score=float(score), rank=rank)
            out.append(row)
        return out

    def retrieve_batch(self, queries, top_k=None):
        return self._r.retrieve_batch(queries, top_k)

    @property
    def last_timings(self) -> Dict:
        return getattr(self._r, "last_timings", {})
