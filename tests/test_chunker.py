"""Chunker behavior vs the reference contract
(local_rag_complete.py:240-465; markdown_chunking_strategy.py overlap)."""

from hybrid_rag_colbertv2_tpu.ingest.chunker import (
    ChunkerConfig,
    MarkdownChunker,
)

DOC = """Intro paragraph before any heading.

# Machine Learning

ML is the study of algorithms that improve with data.

## Supervised Learning

Supervised learning uses labeled examples. """ + ("It maps inputs to "
"outputs using training pairs. " * 40) + """

## Unsupervised Learning

Clustering finds structure without labels.

### K-Means

K-means partitions points into k clusters.

# Deep Learning

Neural networks stack layers of differentiable functions.
"""


def _mk(min_t=30, max_t=80, overlap=0):
    return MarkdownChunker(ChunkerConfig(min_tokens=min_t, max_tokens=max_t,
                                         overlap_tokens=overlap))


def test_parse_hierarchy_paths():
    ch = _mk()
    secs = ch.parse_sections(DOC)
    by_title = {s.title: s for s in secs}
    assert by_title["Introduction"].level == 0
    assert by_title["Supervised Learning"].parent_path == "Machine Learning"
    assert (by_title["K-Means"].full_path
            == "Machine Learning > Unsupervised Learning > K-Means")
    # heading stack pops correctly: Deep Learning has no parent
    assert by_title["Deep Learning"].parent_path == ""


def test_chunks_respect_max_and_context():
    ch = _mk()
    chunks = ch.chunk(DOC, doc_context="Document: ml.md")
    assert chunks
    for c in chunks:
        assert c["token_count"] <= 80 * 1.3   # renders add small overhead
        assert c["doc_context"] == "Document: ml.md"
    # the oversized Supervised Learning section got split into parts
    split = [c for c in chunks if c["type"] == "split_section"]
    assert len(split) >= 2
    assert all("Supervised Learning" in c["heading_path"] for c in split)
    # split parts re-carry the heading
    assert all(c["text"].startswith("# Supervised Learning") for c in split)
    # parent context preserved in rendered section text
    km = [c for c in chunks if "K-Means" in c["text"]]
    assert any("[Context: Machine Learning > Unsupervised Learning]"
               in c["text"] or "Unsupervised" in c["heading_path"]
               for c in km)


def test_small_sections_accumulate_or_merge():
    ch = _mk(min_t=50, max_t=200)
    chunks = ch.chunk(DOC)
    kinds = {c["type"] for c in chunks}
    assert kinds & {"accumulated", "merged", "section", "split_section"}
    # the undersized-neighbor merge pass ran: no two ADJACENT chunks both
    # small enough that merging them would have fit the budget
    for a, b in zip(chunks, chunks[1:]):
        assert a["token_count"] + b["token_count"] > 200 or \
            a["token_count"] >= 50


def test_overlap_metadata():
    ch = _mk(overlap=10)
    chunks = ch.chunk(DOC)
    assert "overlap_preview" not in chunks[0]
    for prev, cur in zip(chunks, chunks[1:]):
        assert cur["overlap_preview"] == " ".join(prev["text"].split()[-10:])
        # overlap is metadata only — never concatenated into text
        assert not cur["text"].startswith(cur["overlap_preview"]) or \
            prev["text"].endswith(cur["overlap_preview"])


def test_level1_standalone_rule():
    doc = "# A\n\nshort a\n\n# B\n\nshort b\n"
    merged = MarkdownChunker(ChunkerConfig(min_tokens=30, max_tokens=100)
                             ).chunk(doc)
    standalone = MarkdownChunker(
        ChunkerConfig(min_tokens=30, max_tokens=100, level1_standalone=True)
    ).chunk(doc)
    assert len(standalone) >= len(merged)


def test_plain_text_no_headings():
    ch = _mk()
    chunks = ch.chunk("just a plain paragraph\n\nand another one\n")
    assert len(chunks) == 1
    assert chunks[0]["heading_path"] in ("Introduction", "")
    assert "plain paragraph" in chunks[0]["text"]


def test_custom_token_counter_used():
    calls = []

    def counter(text):
        calls.append(text)
        return len(text.split())

    ch = MarkdownChunker(ChunkerConfig(min_tokens=5, max_tokens=50),
                         count_tokens=counter)
    ch.chunk(DOC)
    assert calls  # injected counter actually used


def test_empty_input():
    assert _mk().chunk("") == []
