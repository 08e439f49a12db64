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
) -> List[Tuple[str, int]]:
    """-> list of (pseudo_query_text, positive_corpus_index)."""
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
            pairs.append((" ".join(words[start : start + n]), idx))
    rng.shuffle(pairs)
    return pairs
