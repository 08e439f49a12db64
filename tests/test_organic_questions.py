"""Hand-written organic question slice (tools/organic_questions.py).

Guards the generator-disjoint eval added for VERDICT r4 #3: the anchors
must keep resolving against the repo's own chunked documentation (doc
edits that orphan an anchor should fail HERE, not silently shrink the
bench slice), and the gold sets must stay small enough that hit@10 means
something.
"""

from pathlib import Path

from hybrid_rag_colbertv2_tpu.ingest.chunker import (ChunkerConfig,
                                                     MarkdownChunker)
from hybrid_rag_colbertv2_tpu.tools.organic_questions import (QUESTIONS,
                                                              resolve_gold)

ROOT = Path(__file__).resolve().parents[1]
DOCS = ["README.md", "SURVEY.md", "PARITY.md", "BASELINE.md",
        "docs/architecture.md", "docs/performance.md", "docs/scaling.md"]


def _corpus():
    ch = MarkdownChunker(ChunkerConfig(min_tokens=48, max_tokens=96))
    out = []
    for p in DOCS:
        f = ROOT / p
        if f.exists():
            out += [c["text"] for c in ch.chunk(f.read_text())]
    return out


def test_anchors_resolve_against_repo_docs():
    corpus = _corpus()
    assert len(corpus) > 200
    resolved, dropped = resolve_gold(corpus)
    # every anchor should match today; allow at most 2 to drift before
    # failing loud (the bench logs the dropped list either way)
    assert len(dropped) <= 2, f"orphaned anchors: {dropped}"
    assert len(resolved) >= len(QUESTIONS) - 2


def test_gold_sets_are_discriminative():
    corpus = _corpus()
    resolved, _ = resolve_gold(corpus)
    n = len(corpus)
    for q, gold in resolved:
        # a gold set spanning >5% of the corpus makes hit@10 trivial
        assert len(gold) <= max(10, n // 20), (q, len(gold))


def test_questions_are_vocabulary_disjointish():
    """The slice's reason to exist: questions must not be span copies.
    Mean stemmed-content-word overlap with their gold chunks stays under
    0.5 (template ICT spans sit at ~1.0 by construction)."""
    import numpy as np

    from hybrid_rag_colbertv2_tpu.index.textproc import tokenize_lexical

    corpus = _corpus()
    resolved, _ = resolve_gold(corpus)
    overlaps = []
    for q, gold in resolved:
        qt = set(tokenize_lexical(q))
        if not qt:
            continue
        best = max(len(qt & set(tokenize_lexical(corpus[g]))) / len(qt)
                   for g in gold)
        overlaps.append(best)
    assert float(np.mean(overlaps)) < 0.5, float(np.mean(overlaps))
