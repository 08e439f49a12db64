"""Training-pair generation for self-contained encoder adaptation.

The reference never trains anything — it downloads a fixed checkpoint. In a
zero-network environment the framework can still get a *semantically useful*
encoder by contrastively training the small backbone on the corpus itself:
pseudo-queries are sampled spans of each chunk (ICT-style inverse cloze),
the source chunk is the positive, and in-batch chunks are negatives.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def pseudo_query_pairs(
    corpus: Sequence[str],
    *,
    n_pairs_per_doc: int = 2,
    query_words: Tuple[int, int] = (3, 8),
    seed: int = 0,
    word_dropout: float = 0.0,
    synonym_prob: float = 0.0,
) -> List[Tuple[str, int]]:
    """-> list of (pseudo_query_text, positive_corpus_index).

    ``word_dropout`` > 0 drops each span word with that probability
    (always keeping at least query_words[0] words): queries stop being
    verbatim substrings, which (a) trains the encoder to rank under
    partial lexical overlap instead of memorizing exact spans and (b)
    makes held-out evaluation less of a best case for BM25.

    ``synonym_prob`` > 0 replaces each span word with that probability by
    a synonym from the built-in lexicon (train/lexicon.py, sampled
    uniformly): the query says "60"/"rapid" while the chunk says
    "sixty"/"fast". This teaches the encoder synonym invariance — the
    capability a pretrained checkpoint gets for free and the
    lexically-adversarial eval slice measures (VERDICT r3 next #1b).
    Substituted words are no longer source-chunk words, so synonym
    queries are lexically adversarial by construction."""
    from .lexicon import substitute_words

    rng = np.random.default_rng(seed)
    pairs: List[Tuple[str, int]] = []
    for idx, text in enumerate(corpus):
        words = text.split()
        if len(words) < query_words[0]:
            continue
        for _ in range(n_pairs_per_doc):
            n = int(rng.integers(query_words[0],
                                 min(query_words[1], len(words)) + 1))
            start = int(rng.integers(0, max(len(words) - n, 0) + 1))
            span = words[start: start + n]
            if word_dropout > 0.0 and len(span) > query_words[0]:
                keep = rng.random(len(span)) >= word_dropout
                # never drop below the minimum query length
                while keep.sum() < query_words[0]:
                    keep[int(rng.integers(0, len(span)))] = True
                span = [w for w, k in zip(span, keep) if k]
            if synonym_prob > 0.0:
                span = substitute_words(span, prob=synonym_prob, rng=rng,
                                        pick="random")
            pairs.append((" ".join(span), idx))
    rng.shuffle(pairs)
    return pairs


def mine_hard_negatives(
    corpus: Sequence[str],
    pairs: Sequence[Tuple[str, int]],
    *,
    n_negatives: int = 4,
    seed: int = 0,
    lexical=None,
) -> List[Tuple[str, int, List[int]]]:
    """Attach BM25-mined hard negatives to (query, positive_idx) pairs.

    For each pseudo-query, the negatives are the top-BM25-scoring chunks
    that are NOT the positive — exactly the documents the retrieval cascade
    will confuse with the source at query time (the final top-k is chosen
    by the dense rerank over BM25-surfaced candidates, retrieval/cascade.py
    stage 3), so these are the discriminations the encoder must learn.
    In-batch-only negatives are mostly random chunks and teach topic
    separation but not within-topic ranking.

    ``lexical``: an existing index/lexical.LexicalIndex to reuse; when
    None one is built over ``corpus`` (uncapped postings — mining wants
    exact scores). Scoring runs on host (LexicalIndex.score_host): mining
    is a one-time build-phase cost, not a serving-path op.

    -> list of (query, positive_idx, [negative_idx, ...]); every entry
    carries min(n_negatives, len(corpus) - 1) negatives — BM25-mined
    first, padded with random non-positive chunks when the query matches
    too few documents.
    """
    from ..index.lexical import LexicalIndex

    if lexical is None:
        lexical = LexicalIndex.build(list(corpus))
    rng = np.random.default_rng(seed)
    n = len(corpus)
    # a corpus of n chunks has only n-1 possible negatives per pair
    target = min(n_negatives, max(n - 1, 0))
    out: List[Tuple[str, int, List[int]]] = []
    for q, pos in pairs:
        scores = lexical.score_host(q)
        order = np.argsort(-scores)
        negs = [int(i) for i in order[: target + 1]
                if int(i) != pos and scores[i] > 0.0][:target]
        if len(negs) < target:
            # pad from a permutation — bounded, unlike rejection sampling
            for cand in rng.permutation(n):
                if len(negs) >= target:
                    break
                cand = int(cand)
                if cand != pos and cand not in negs:
                    negs.append(cand)
        out.append((q, pos, negs))
    return out
