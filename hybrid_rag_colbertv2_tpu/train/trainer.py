"""Contrastive ColBERT training — jitted step, mesh-sharded (DP over batch).

New capability vs the reference (which only downloads a fixed checkpoint):
in-batch-negative contrastive training of the encoder. The loss is the
standard ColBERT objective: for a batch of (query, positive-doc) pairs,
score every query against every doc in the batch with true MaxSim and apply
softmax cross-entropy against the diagonal. Optional BM25-mined hard
negatives (train/data.py::mine_hard_negatives) extend the candidate set to
positives + negatives, teaching within-topic ranking rather than just
topic separation.

Parallelism: the batch axis is sharded over the mesh's ``data`` axis via
input shardings; parameters are replicated; XLA inserts the gradient
all-reduce. This is the framework's "full training step" exercised by
``__graft_entry__.dryrun_multichip`` on a virtual device mesh.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.colbert import ColBERTConfig, ColBERTEncoder, ColBERTModel
from ..utils.cache import JitCache
from ..utils.logging import get_logger

log = get_logger(__name__)

# (model, optimizer knobs) -> (tx, jitted step). Multi-seed harnesses
# (bench realdata trains 3 seeds) build one trainer per seed; sharing the
# jitted step saves a full train-step compile each time (up to ~8 min on
# a contended tunneled TPU). optax transforms are pure, so trainers with
# identical knobs can share one tx (each still inits its own opt_state).
_STEP_CACHE = JitCache(max_entries=8)


def _shared_step(model: "ColBERTModel", cfg: "TrainConfig"):
    key = (model, cfg.learning_rate, cfg.weight_decay, cfg.steps,
           cfg.warmup_steps, cfg.temperature, cfg.tie_weight,
           cfg.tie_pairs)

    def build():
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps,
            max(cfg.steps, cfg.warmup_steps + 1))
        tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
        return tx, make_train_step(model, tx, cfg.temperature,
                                   cfg.tie_weight, cfg.tie_pairs)

    return _STEP_CACHE.get_or_build(key, build)


@dataclass
class TrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    batch_size: int = 16          # global batch (must divide by mesh 'data')
    doc_len: int = 64
    # softmax temperature over the (B, B) MaxSim score matrix. MaxSim sums
    # over ~32 query tokens, so raw scores already span tens of units —
    # sharpening further (e.g. 0.05) turns the softmax into a hard argmax
    # whose gradients carry no ranking signal (measured: acc stuck at
    # chance after 120 steps at 0.05; 0.76 and climbing at 1.0).
    temperature: float = 1.0
    steps: int = 100
    warmup_steps: int = 10
    seed: int = 0
    # synonym-embedding tie regularizer: mean squared distance between
    # lexicon (key, synonym) embedding rows (train/lexicon.py
    # ``synonym_tie_pairs``), scaled by ``tie_weight``. The rows start
    # EQUAL (tie_synonym_embeddings init), so this costs nothing at step
    # 0 and only resists contrastive drift — the training-time half of
    # the pretrained-thesaurus prior. ``tie_pairs`` must be a hashable
    # tuple of (key_id, syn_id) int tuples (it keys the jit cache).
    tie_weight: float = 0.0
    tie_pairs: Optional[Tuple[Tuple[int, int], ...]] = None


def _maxsim_matrix(q_emb: jax.Array, d_emb: jax.Array,
                   d_mask: jax.Array) -> jax.Array:
    """All-pairs MaxSim: (B,Lq,D) x (B,Ld,D) -> (B,B) scores."""
    sims = jnp.einsum("bqd,cld->bcql", q_emb, d_emb,
                      preferred_element_type=jnp.float32)
    sims = jnp.where(d_mask[None, :, None, :].astype(bool), sims, -1e30)
    return jnp.sum(jnp.max(sims, axis=-1), axis=-1)


def make_train_step(model: ColBERTModel, tx: optax.GradientTransformation,
                    temperature: float, tie_weight: float = 0.0,
                    tie_pairs: Optional[Tuple[Tuple[int, int], ...]] = None):
    """Returns step(params, opt_state, batch) -> (params, opt_state, metrics).

    batch: dict of q_ids/q_mask/d_ids/d_mask, batch axis shardable.
    """
    use_tie = tie_weight > 0.0 and tie_pairs
    if use_tie:
        tie_a = jnp.asarray([p[0] for p in tie_pairs], dtype=jnp.int32)
        tie_b = jnp.asarray([p[1] for p in tie_pairs], dtype=jnp.int32)

    def loss_fn(params, batch):
        q_emb = model.apply({"params": params}, batch["q_ids"],
                            batch["q_mask"])
        d_emb = model.apply({"params": params}, batch["d_ids"],
                            batch["d_mask"])
        scores = _maxsim_matrix(q_emb, d_emb, batch["d_mask"]) / temperature
        labels = jnp.arange(scores.shape[0])
        loss = optax.softmax_cross_entropy_with_integer_labels(
            scores, labels).mean()
        acc = jnp.mean(jnp.argmax(scores, axis=-1) == labels)
        if use_tie:
            # keep lexicon synonym rows near their key rows (equal at
            # init — see TrainConfig.tie_weight)
            table = params["word_embeddings"]["embedding"]
            diff = table[tie_a] - table[tie_b]
            loss = loss + tie_weight * jnp.mean(
                jnp.sum(diff * diff, axis=-1))
        return loss, acc

    @jax.jit
    def step(params, opt_state, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return step


class ColBERTTrainer:
    """Host-side loop: tokenize pairs, shard batches over the mesh, step."""

    def __init__(
        self,
        encoder: ColBERTEncoder,
        train_cfg: Optional[TrainConfig] = None,
        mesh: Optional[Mesh] = None,
        data_axis: str = "data",
    ):
        self.encoder = encoder
        self.cfg = train_cfg or TrainConfig()
        self.mesh = mesh
        self.data_axis = data_axis
        self.tx, self.step_fn = _shared_step(encoder.model, self.cfg)
        self.opt_state = self.tx.init(encoder.params)
        self._batch_sharding = None
        if mesh is not None:
            self._batch_sharding = NamedSharding(mesh, P(data_axis, None))

    # ------------------------------------------------------------------
    def _make_batch(self, pairs: Sequence[Sequence[str]]) -> Dict:
        """pairs: (query_text, positive_doc_text) or
        (query_text, positive_doc_text, [hard_negative_texts...]).

        Doc rows are laid out positives-first — rows 0..B-1 are the
        positives so the (B, C) score matrix's diagonal is the label —
        followed by every pair's hard negatives (train/data.py
        ``mine_hard_negatives``). The loss needs no change: softmax CE
        over C = B*(1+H) candidates per query. All rows in one batch must
        carry the same negative count (static shapes)."""
        cfg = self.encoder.cfg
        q_ids = np.stack([
            self.encoder.tokenizer.encode_query(p[0], cfg.query_max_tokens)
            for p in pairs])
        q_mask = np.ones_like(q_ids)
        doc_texts = [p[1] for p in pairs]
        n_neg = len(pairs[0][2]) if len(pairs[0]) > 2 else 0
        for p in pairs:
            got = len(p[2]) if len(p) > 2 else 0
            if got != n_neg:
                raise ValueError(
                    f"inconsistent hard-negative counts in batch: "
                    f"{got} != {n_neg}")
        if n_neg:
            for p in pairs:
                doc_texts.extend(p[2])
        d_ids, d_ns = self.encoder.tokenizer.encode_docs(
            doc_texts, self.cfg.doc_len)
        d_mask = (np.arange(self.cfg.doc_len)[None, :]
                  < d_ns[:, None]).astype(np.int32)
        batch = {"q_ids": q_ids, "q_mask": q_mask,
                 "d_ids": d_ids, "d_mask": d_mask}
        out = {k: jnp.asarray(v) for k, v in batch.items()}
        if self._batch_sharding is not None:
            out = {k: jax.device_put(v, self._batch_sharding)
                   for k, v in out.items()}
        return out

    # -- checkpoint / resume (orbax) --------------------------------------
    def save_checkpoint(self, path: str, step: int = 0) -> None:
        """Persist params + optimizer state + step for resume
        (SURVEY.md section 5, checkpoint/resume — new vs the reference,
        which has no mid-build resume at all)."""
        import orbax.checkpoint as ocp
        from pathlib import Path as _P

        ckptr = ocp.StandardCheckpointer()
        p = _P(path).absolute()
        ckptr.save(p, {"params": self.encoder.params,
                       "opt_state": self.opt_state,
                       "step": step}, force=True)
        ckptr.wait_until_finished()

    def restore_checkpoint(self, path: str) -> int:
        import orbax.checkpoint as ocp
        from pathlib import Path as _P

        ckptr = ocp.StandardCheckpointer()
        target = {"params": self.encoder.params,
                  "opt_state": self.opt_state, "step": 0}
        restored = ckptr.restore(_P(path).absolute(), target)
        self.encoder.params = restored["params"]
        self.opt_state = restored["opt_state"]
        return int(restored["step"])

    # ------------------------------------------------------------------
    def train(self, pairs: List[Sequence[str]],
              steps: Optional[int] = None) -> List[Dict]:
        """Cycle through (query, doc-text[, neg-texts]) tuples; returns
        per-step metrics. With 3-tuples each batch scores queries against
        positives + every pair's BM25-mined hard negatives (see
        ``_make_batch``)."""
        steps = steps or self.cfg.steps
        bs = self.cfg.batch_size
        if len(pairs) < bs:
            reps = -(-bs // max(len(pairs), 1))
            pairs = (pairs * reps)[: max(bs, len(pairs))]
        # pre-group into batches with DISTINCT positive docs — duplicated
        # positives make in-batch-negative labels ambiguous
        batches: List[List[Tuple[str, str]]] = []
        cur: List[Tuple[str, str]] = []
        seen: set = set()
        leftovers: List[Tuple[str, str]] = []
        for p in pairs:
            if p[1] in seen:
                leftovers.append(p)
            else:
                cur.append(p)
                seen.add(p[1])
            if len(cur) == bs:
                batches.append(cur)
                cur, seen = [], set()
        for p in leftovers:          # fill remaining slots, allowing dups
            if p[1] in seen:
                continue
            cur.append(p)
            seen.add(p[1])
            if len(cur) == bs:
                batches.append(cur)
                cur, seen = [], set()
        if cur and not batches:
            # fewer distinct positives than batch_size: train on the
            # smaller batch rather than tiling pairs — duplicated
            # positives make identical-text columns compete as negatives
            # (loss floors at log(#dups) and gradients push identical
            # docs apart). Under a mesh the batch axis must divide the
            # data axis; trim to the largest multiple.
            if self.mesh is not None:
                n_data = self.mesh.shape[self.data_axis]
                keep = (len(cur) // n_data) * n_data
                if keep == 0:
                    log.warning(
                        "only %d distinct training pairs for a %d-way "
                        "data mesh — skipping training", len(cur), n_data)
                    cur = []
                cur = cur[:keep]
            if cur:
                batches.append(cur)
        if not batches:
            log.warning("no trainable batches — returning without training")
            return []
        params = self.encoder.params
        metrics: List[Dict] = []
        bpos = 0
        # host BPE tokenization dominates step wall-time if repeated —
        # tokenize each batch ONCE on first use and reuse the device
        # arrays across epochs (the pair->batch grouping is fixed)
        batch_cache: List[Optional[Dict]] = [None] * len(batches)
        for step in range(steps):
            if bpos >= len(batches):
                bpos = 0
            if batch_cache[bpos] is None:
                batch_cache[bpos] = self._make_batch(batches[bpos])
            batch = batch_cache[bpos]
            bpos += 1
            params, self.opt_state, m = self.step_fn(
                params, self.opt_state, batch)
            metrics.append({k: float(v) for k, v in m.items()})
            if step % 20 == 0 or step == steps - 1:
                log.info("train step %d: loss=%.4f acc=%.3f", step,
                         metrics[-1]["loss"], metrics[-1]["accuracy"])
        self.encoder.params = params
        return metrics
