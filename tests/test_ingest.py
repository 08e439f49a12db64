"""Store, PDF fallback reader, and processor pipeline."""

import zlib
from pathlib import Path

import pytest

from hybrid_rag_colbertv2_tpu.config import RAGConfig
from hybrid_rag_colbertv2_tpu.ingest.pdf import (
    document_to_markdown,
    minimal_pdf_to_text,
)
from hybrid_rag_colbertv2_tpu.ingest.processor import DocumentProcessor
from hybrid_rag_colbertv2_tpu.ingest.store import ChunkStore


def make_pdf(path: Path, texts):
    """Hand-built single-page PDF with a Flate content stream."""
    content = b"BT /F1 12 Tf 72 720 Td " + b" ".join(
        b"(%s) Tj 0 -14 Td" % t.encode() for t in texts) + b" ET"
    stream = zlib.compress(content)
    objs = []
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    objs.append(b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox "
                b"[0 0 612 792] /Contents 4 0 R >>\nendobj\n")
    objs.append(b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(stream) + stream + b"\nendstream\nendobj\n")
    body = b"%PDF-1.4\n" + b"".join(objs)
    body += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    path.write_bytes(body)


def test_minimal_pdf_reader(tmp_path):
    p = tmp_path / "doc.pdf"
    make_pdf(p, ["Hello TPU world", "MaxSim scores documents",
                 "with parentheses \\(escaped\\)"])
    text, pages = minimal_pdf_to_text(p)
    assert "Hello TPU world" in text
    assert "MaxSim scores documents" in text
    assert "parentheses (escaped)" in text
    assert pages == 1


def make_sized_pdf(path: Path, sized_lines):
    """Hand-built single-page PDF whose lines carry explicit font sizes:
    ``sized_lines`` = [(pt_size, text), ...]."""
    parts = [b"BT 72 720 Td"]
    for size, text in sized_lines:
        parts.append(b"/F1 %d Tf (%s) Tj 0 -20 Td"
                     % (size, text.encode()))
    parts.append(b"ET")
    content = b" ".join(parts)
    stream = zlib.compress(content)
    objs = []
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    objs.append(b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox "
                b"[0 0 612 792] /Contents 4 0 R >>\nendobj\n")
    objs.append(b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(stream) + stream + b"\nendstream\nendobj\n")
    body = b"%PDF-1.4\n" + b"".join(objs)
    body += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    path.write_bytes(body)


def test_pdf_heading_inference_font_sizes(tmp_path):
    """VERDICT r4 next #5: the built-in reader (no pymupdf) must infer
    ``#`` headings from Tf font sizes so the structure-aware chunker
    sees real hierarchy — matching the pymupdf4llm behavior the
    reference relies on (local_rag_complete.py:483-486)."""
    from hybrid_rag_colbertv2_tpu.ingest.pdf import minimal_pdf_page_texts

    body_a = "The dense retriever scores token embeddings with MaxSim " \
             "over the whole corpus and keeps the best ten documents."
    body_b = "The lexical index scores stemmed terms with saturating " \
             "frequency weights and document length normalization."
    p = tmp_path / "doc.pdf"
    make_sized_pdf(p, [
        (24, "Retrieval Systems Handbook"),        # title -> #
        (18, "Dense retrieval"),                   # section -> ##
        (12, body_a),
        (18, "Lexical retrieval"),                 # section -> ##
        (12, body_b),
    ])
    pages = minimal_pdf_page_texts(p)
    md = "\n".join(pages)
    assert "# Retrieval Systems Handbook" in md
    assert "## Dense retrieval" in md
    assert "## Lexical retrieval" in md
    assert body_a.split()[:4] == md.split(
        "## Dense retrieval")[1].split("##")[0].split()[:4]

    # the chunker sees the hierarchy: chunks carry a real heading_path
    from hybrid_rag_colbertv2_tpu.ingest.chunker import (ChunkerConfig,
                                                         MarkdownChunker)
    chunks = MarkdownChunker(ChunkerConfig(min_tokens=8, max_tokens=64)
                             ).chunk(md)
    paths = {c["heading_path"] for c in chunks}
    # a real hierarchy: the title is the root of every path and at least
    # one section became a nested level (small sections may merge upward)
    assert all(p.startswith("Retrieval Systems Handbook") for p in paths)
    assert any(" > " in p for p in paths), paths


def test_pdf_heading_inference_tm_scale(tmp_path):
    """Headings set via the Tm text-matrix scale (Tf 1 + Tm pattern)."""
    from hybrid_rag_colbertv2_tpu.ingest.pdf import minimal_pdf_page_texts

    content = (b"BT /F1 1 Tf 24 0 0 24 72 720 Tm (Big Title) Tj "
               b"12 0 0 12 72 680 Tm (Plain body text about systems "
               b"and their properties in general.) Tj ET")
    stream = zlib.compress(content)
    objs = []
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    objs.append(b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox "
                b"[0 0 612 792] /Contents 4 0 R >>\nendobj\n")
    objs.append(b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(stream) + stream + b"\nendstream\nendobj\n")
    p = tmp_path / "tm.pdf"
    p.write_bytes(b"%PDF-1.4\n" + b"".join(objs)
                  + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    md = "\n".join(minimal_pdf_page_texts(p))
    assert "# Big Title" in md
    assert "Plain body text" in md and "# Plain" not in md


def test_document_to_markdown_text_files(tmp_path):
    p = tmp_path / "notes.md"
    p.write_text("# Title\n\nSome body text.")
    text, pages = document_to_markdown(p)
    assert text.startswith("# Title")
    assert pages >= 1
    with pytest.raises(ValueError):
        document_to_markdown(tmp_path / "weird.xyz")


def test_store_roundtrip(tmp_path):
    store = ChunkStore(tmp_path / "test.db")
    doc_id = store.add_document("a.pdf", total_pages=3)
    ids = store.add_chunks(doc_id, [
        {"text": "chunk one", "heading_path": "A", "token_count": 2},
        {"text": "chunk two", "heading_path": "A > B", "token_count": 2,
         "has_images": True, "image_paths": ["x.png"]},
    ])
    assert ids == [0, 1]
    # second document continues the global corpus-id space
    doc2 = store.add_document("b.pdf")
    ids2 = store.add_chunks(doc2, [{"text": "chunk three"}])
    assert ids2 == [2]

    c = store.get_chunk(1)
    assert c["text"] == "chunk two" and c["has_images"] is True
    assert c["metadata"]["image_paths"] == ["x.png"]
    batch = store.get_chunks([2, 0])
    assert [b["chunk_id"] for b in batch] == [2, 0]
    assert store.all_chunk_texts() == ["chunk one", "chunk two",
                                       "chunk three"]
    assert store.stats() == {"documents": 2, "chunks": 3, "images": 0}
    assert store.get_chunk(99) is None


def test_processor_pipeline(tmp_path):
    cfg = RAGConfig(
        db_path=str(tmp_path / "p.db"),
        images_dir=str(tmp_path / "imgs"),
        min_chunk_size=10, max_chunk_size=60,
    )
    store = ChunkStore(cfg.db_path)
    proc = DocumentProcessor(cfg, store)  # no vision client
    doc = tmp_path / "ml.md"
    doc.write_text(
        "# Intro\n\nA figure shows the architecture diagram clearly.\n\n"
        "# Details\n\n" + "word " * 100 + "\n")
    chunks, doc_id, ids = proc.process_document(doc)
    assert len(chunks) == len(ids) >= 2
    assert store.stats()["chunks"] == len(chunks)
    assert store.all_chunk_texts()[0] == chunks[0]["text"]
    # no images extracted for markdown; has_images must be False
    assert all(c["has_images"] is False for c in chunks)
    # timings recorded for all 5 stages
    assert set(proc.timer.timings) >= {
        "to_markdown", "images", "chunking", "enrich", "persist"}


def test_enrich_keyword_heuristic():
    chunks = [{"text": "See the figure below for details."},
              {"text": "No visuals mentioned here."}]
    images = [{"image_path": "i.png", "description": "a bar chart",
               "type": "chart"}]
    out = DocumentProcessor.enrich_chunks_with_images(chunks, images)
    assert out[0]["has_images"] and "[Images in this section]" in out[0]["text"]
    assert "Chart: a bar chart" in out[0]["text"]
    assert not out[1]["has_images"]


def test_vision_analysis_pipeline_end_to_end(tmp_path, monkeypatch):
    """Step 2+4 of the processor (reference local_rag_complete.py:488-605):
    image extraction -> vision analysis -> DB -> keyword enrichment, with a
    stub vision client standing in for the LLaVA sidecar."""
    from hybrid_rag_colbertv2_tpu.ingest import processor as proc_mod

    class StubVision:
        calls = []

        def analyze_image(self, path):
            StubVision.calls.append(path)
            return {"description": "A systolic array block diagram.",
                    "type": "diagram", "ocr_text": "MXU 128x128"}

    monkeypatch.setattr(
        proc_mod, "extract_pdf_images",
        lambda path, images_dir, doc_id: [
            {"page_number": 1, "image_path": str(tmp_path / "fig1.png")}])
    monkeypatch.setattr(
        proc_mod, "document_to_markdown_pages",
        lambda path: ("# Arch\n\nSee the figure below for the MXU layout.\n",
                      [0]))

    cfg = RAGConfig(images_dir=str(tmp_path / "imgs"),
                    min_chunk_size=2, max_chunk_size=64)
    store = ChunkStore(str(tmp_path / "v.db"))
    proc = DocumentProcessor(cfg, store, vision_client=StubVision())
    chunks, doc_id, ids = proc.process_document(tmp_path / "whatever.pdf")

    assert StubVision.calls  # the sidecar was consulted
    imgs = store.get_images(doc_id)
    assert imgs[0]["description"] == "A systolic array block diagram."
    assert imgs[0]["image_type"] == "diagram"
    assert imgs[0]["ocr_text"] == "MXU 128x128"
    # keyword heuristic ('figure') attaches the analyzed image to the chunk
    enriched = [c for c in chunks if c["has_images"]]
    assert enriched and "systolic array block diagram" in enriched[0]["text"].lower()


def test_vision_failure_degrades_not_blocks(tmp_path, monkeypatch):
    from hybrid_rag_colbertv2_tpu.ingest import processor as proc_mod

    class DownVision:
        def analyze_image(self, path):
            raise ConnectionError("sidecar down")

    monkeypatch.setattr(
        proc_mod, "extract_pdf_images",
        lambda path, images_dir, doc_id: [
            {"page_number": 1, "image_path": "/nope.png"}])
    monkeypatch.setattr(
        proc_mod, "document_to_markdown_pages",
        lambda path: ("# T\n\nplain text content\n", [0]))

    cfg = RAGConfig(images_dir=str(tmp_path / "imgs"),
                    min_chunk_size=2, max_chunk_size=64)
    store = ChunkStore(str(tmp_path / "w.db"))
    proc = DocumentProcessor(cfg, store, vision_client=DownVision())
    chunks, doc_id, ids = proc.process_document(tmp_path / "x.pdf")
    assert chunks                       # ingestion proceeded
    assert store.get_images(doc_id)[0]["description"] == ""


def test_pdf_octal_escape_with_8_and_9():
    """\\8 and \\9 are not octal escapes — the spec drops the backslash
    and keeps the char (previously int('8', 8) raised and aborted the
    whole upload)."""
    from hybrid_rag_colbertv2_tpu.ingest.pdf import _unescape_pdf_string

    assert _unescape_pdf_string(rb"a\8b") == b"a8b"
    assert _unescape_pdf_string(rb"a\9b") == b"a9b"
    assert _unescape_pdf_string(rb"a\101b") == b"aAb"     # real octal
    assert _unescape_pdf_string(b"a\\\nb") == b"ab"       # line continuation


def test_placeholder_artifacts_not_persisted_before_upload(tmp_path):
    """--query/--chat before any --upload must NOT seed the indexes dir
    with a placeholder-trained tokenizer/random params (they would pin
    degenerate tokenization for every later real upload)."""
    import pytest as _pytest

    from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
    from hybrid_rag_colbertv2_tpu.config import RAGConfig

    cfg = RAGConfig(
        db_path=str(tmp_path / "rag.db"),
        bm25_index_path=str(tmp_path / "idx/bm25"),
        colbert_index_path=str(tmp_path / "idx/colbert"),
        tokenizer_path=str(tmp_path / "idx/tokenizer.json"),
        images_dir=str(tmp_path / "img"),
        min_chunk_size=16, max_chunk_size=64,
        encoder_preset="tiny", tokenizer_vocab_size=300,
    )
    app = RAGApplication(cfg, use_ollama=False)
    with _pytest.raises(RuntimeError, match="nothing indexed"):
        app.initialize_chatbot()
    assert not (tmp_path / "idx/tokenizer.json").exists()
    assert not (tmp_path / "idx/colbert/encoder_params.npz").exists()
    # a real upload afterwards trains the real-corpus tokenizer
    doc = tmp_path / "d.md"
    doc.write_text("# Title\n\nreal corpus content with many words here\n")
    app.index_documents([str(doc)])
    assert (tmp_path / "idx/tokenizer.json").exists()
    app.initialize_chatbot(use_mesh=False)
    assert app.query("real corpus content")


def test_document_to_markdown_pages_formfeed(tmp_path):
    """Form feeds split text/markdown into pages; page_first_line maps
    lines back to 1-based pages (VERDICT r3 next #5 groundwork)."""
    from hybrid_rag_colbertv2_tpu.ingest.pdf import \
        document_to_markdown_pages

    p = tmp_path / "doc.md"
    p.write_text("# A\n\npage one text\n\f# B\n\npage two text\n")
    md, page_lines = document_to_markdown_pages(p)
    assert len(page_lines) == 2 and page_lines[0] == 0
    lines = md.split("\n")
    # page 2's heading lands at/after its recorded first line
    assert lines[page_lines[1]].startswith("# B")
    # single page: no \f -> [0]
    q = tmp_path / "one.md"
    q.write_text("# Only\n\ntext\n")
    assert document_to_markdown_pages(q)[1] == [0]


def test_chunker_line_spans():
    from hybrid_rag_colbertv2_tpu.ingest.chunker import (ChunkerConfig,
                                                         MarkdownChunker)

    md = "# A\n\naaa bbb ccc\n\n# B\n\nddd eee fff\n"
    ch = MarkdownChunker(ChunkerConfig(min_tokens=2, max_tokens=6))
    chunks = ch.chunk(md)
    assert all(c["line_start"] >= 0 and c["line_end"] >= c["line_start"]
               for c in chunks)
    # section A spans lines 0..3, section B starts at line 4
    a = next(c for c in chunks if "aaa" in c["text"])
    b = next(c for c in chunks if "ddd" in c["text"])
    assert a["line_start"] == 0 and b["line_start"] == 4


def test_page_proximity_image_association():
    """VERDICT r3 next #5: page mode attaches an image only to chunks
    whose source-page span contains it; reference behavior stays
    available as mode='document'."""
    chunks = [
        {"text": "See the figure on page one.", "page_start": 1,
         "page_end": 1},
        {"text": "Second page discussion.", "page_start": 2,
         "page_end": 2},
        {"text": "Chunk spanning both pages.", "page_start": 1,
         "page_end": 2},
    ]
    images = [{"image_path": "p2.png", "description": "a scatter plot",
               "type": "chart", "page_number": 2}]
    out = DocumentProcessor.enrich_chunks_with_images(
        [dict(c) for c in chunks], images, mode="page")
    assert not out[0]["has_images"]          # page-1 chunk: no page-2 image
    assert out[1]["has_images"] and "scatter plot" in out[1]["text"]
    assert out[2]["has_images"]              # spans page 2
    # reference parity mode: keyword-matching chunk gets EVERY image
    out_doc = DocumentProcessor.enrich_chunks_with_images(
        [dict(c) for c in chunks], images, mode="document")
    assert out_doc[0]["has_images"]          # 'figure' keyword
    assert not out_doc[1]["has_images"]      # no keyword


def test_multipage_pipeline_page_association(tmp_path, monkeypatch):
    """End-to-end: a two-page document with a page-2 image — only the
    page-2 chunks carry it (VERDICT r3 next #5 done-condition)."""
    from hybrid_rag_colbertv2_tpu.ingest import processor as proc_mod

    md = ("# Alpha\n\nfirst page words about systolic arrays\n\f"
          "# Beta\n\nsecond page words about reef ecology\n")
    p = tmp_path / "doc.md"
    p.write_text(md)
    monkeypatch.setattr(
        proc_mod, "extract_pdf_images",
        lambda path, images_dir, doc_id: [
            {"page_number": 2, "image_path": "fig2.png"}])
    cfg = RAGConfig(images_dir=str(tmp_path / "imgs"),
                    min_chunk_size=2, max_chunk_size=64)
    store = ChunkStore(str(tmp_path / "m.db"))
    proc = DocumentProcessor(cfg, store)
    chunks, doc_id, ids = proc.process_document(p)
    page1 = [c for c in chunks if "systolic" in c["text"]]
    page2 = [c for c in chunks if "reef" in c["text"]]
    assert page1 and page2
    assert all(not c["has_images"] for c in page1)
    assert all(c["has_images"] for c in page2)
    assert all(c.get("page_start") == 2 for c in page2)
    # persisted metadata carries the page span
    meta = store.get_chunk(ids[-1])["metadata"]
    assert meta.get("page_start") in (1, 2)


# ---------------------------------------------------------------------------
# Multi-page minimal-reader object graph (page-true text + image pages)
# ---------------------------------------------------------------------------

_FAKE_JPEG = b"\xff\xd8\xff\xe0" + b"J" * 64 + b"\xff\xd9"


def make_multipage_pdf(path: Path, page_texts, image_pages=()):
    """Hand-built multi-page PDF with a real object graph: catalog ->
    pages tree -> per-page /Contents; pages in ``image_pages`` (1-based)
    also carry a DCTDecode image XObject in their /Resources. A page
    whose text is None is image-only (no /Contents)."""
    objs = {}
    next_num = 3  # 1 = catalog, 2 = pages node
    page_nums = []
    for i, text in enumerate(page_texts):
        page_num = next_num
        next_num += 1
        entries = [b"/Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"]
        if text is not None:
            content = (b"BT /F1 12 Tf 72 720 Td (%s) Tj ET"
                       % text.encode())
            stream = zlib.compress(content)
            objs[next_num] = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(stream) + stream + b"\nendstream\n")
            entries.append(b"/Contents %d 0 R" % next_num)
            next_num += 1
        if (i + 1) in image_pages:
            objs[next_num] = (
                b"<< /Type /XObject /Subtype /Image /Width 8 /Height 8 "
                b"/Filter /DCTDecode /Length %d >>\nstream\n"
                % len(_FAKE_JPEG) + _FAKE_JPEG + b"\nendstream\n")
            entries.append(
                b"/Resources << /XObject << /Im1 %d 0 R >> >>" % next_num)
            next_num += 1
        objs[page_num] = b"<< " + b" ".join(entries) + b" >>\n"
        page_nums.append(page_num)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>\n"
    objs[2] = (b"<< /Type /Pages /Kids [" +
               b" ".join(b"%d 0 R" % n for n in page_nums) +
               b"] /Count %d >>\n" % len(page_nums))
    body = b"%PDF-1.4\n"
    for num in sorted(objs):
        body += b"%d 0 obj\n" % num + objs[num] + b"endobj\n"
    body += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    path.write_bytes(body)


def test_minimal_reader_page_graph_text_order(tmp_path):
    from hybrid_rag_colbertv2_tpu.ingest.pdf import minimal_pdf_page_texts

    p = tmp_path / "three.pdf"
    make_multipage_pdf(p, ["Alpha systolic arrays",
                           "Beta memory bandwidth",
                           "Gamma interconnect mesh"])
    pages = minimal_pdf_page_texts(p)
    assert len(pages) == 3
    assert "Alpha systolic arrays" in pages[0]
    assert "Beta memory bandwidth" in pages[1]
    assert "Gamma interconnect mesh" in pages[2]


def test_minimal_reader_image_only_page_keeps_slot(tmp_path):
    """A full-page-image page (no text stream) must keep its page slot:
    the one-stream-per-page heuristic used to collapse it, shifting every
    later page's number (and thus chunk page spans) off by one."""
    from hybrid_rag_colbertv2_tpu.ingest.pdf import minimal_pdf_page_texts

    p = tmp_path / "imgonly.pdf"
    make_multipage_pdf(p, ["Page one text", None, "Page three text"],
                       image_pages={2})
    pages = minimal_pdf_page_texts(p)
    assert len(pages) == 3
    assert "Page one text" in pages[0]
    assert pages[1].strip() == ""
    assert "Page three text" in pages[2]


def test_minimal_reader_image_true_page_number(tmp_path):
    from hybrid_rag_colbertv2_tpu.ingest.pdf import minimal_pdf_images

    p = tmp_path / "fig.pdf"
    make_multipage_pdf(p, ["First page", "Second page with figure",
                           "Third page"], image_pages={2})
    images = minimal_pdf_images(p, tmp_path / "imgs", document_id=7)
    assert len(images) == 1
    assert images[0]["page_number"] == 2
    assert Path(images[0]["image_path"]).read_bytes() == _FAKE_JPEG


def test_unknown_image_pages_degrade_to_document_mode(tmp_path, monkeypatch):
    """Images with page_number=0 (graph unresolvable) must NOT be
    proximity-attached to page 1 — the processor degrades to the
    reference's document-wide keyword association."""
    from hybrid_rag_colbertv2_tpu.ingest import processor as proc_mod

    md = ("# One\n\n" + "first page words here. " * 12 +
          "\n\n# Two\n\nsee the figure below for details. " +
          "second page words here. " * 12)
    # two pages, image page unknown (0)
    monkeypatch.setattr(
        proc_mod, "extract_pdf_images",
        lambda path, images_dir, doc_id: [
            {"page_number": 0, "image_path": str(tmp_path / "f.jpg")}])
    monkeypatch.setattr(
        proc_mod, "document_to_markdown_pages",
        lambda path: (md, [0, md.split("\n").index("# Two")]))

    cfg = RAGConfig(images_dir=str(tmp_path / "imgs"),
                    min_chunk_size=2, max_chunk_size=48)
    store = ChunkStore(str(tmp_path / "u.db"))
    proc = DocumentProcessor(cfg, store)
    chunks, doc_id, ids = proc.process_document(tmp_path / "u.pdf")
    # keyword mode: only the 'figure'-mentioning chunk is enriched,
    # nothing is page-attached to page-1 chunks
    enriched = [c for c in chunks if c["has_images"]]
    assert enriched
    assert all("figure" in c["text"].lower() for c in enriched)


def test_minimal_reader_fuzz_no_crash(tmp_path):
    """The object-graph parser must never raise on arbitrary bytes —
    malformed uploads degrade (empty text / no images), not abort."""
    import random

    from hybrid_rag_colbertv2_tpu.ingest.pdf import (
        minimal_pdf_images, minimal_pdf_page_texts, pdf_page_graph)

    rng = random.Random(0)
    tokens = [b"%PDF-1.4", b"obj", b"endobj", b"stream\n", b"endstream",
              b"<<", b">>", b"[", b"]", b"/Type", b"/Page", b"/Pages",
              b"/Kids", b"/Contents", b"/Root", b"/Resources", b"/XObject",
              b"/Subtype", b"/Image", b"/DCTDecode", b"0 R", b"1 0 obj",
              b"trailer", bytes(rng.randbytes(40))]
    for trial in range(25):
        n = rng.randrange(3, 60)
        blob = b" ".join(rng.choice(tokens) for _ in range(n))
        p = tmp_path / f"fuzz{trial}.pdf"
        p.write_bytes(blob)
        pdf_page_graph(blob)                      # must not raise
        minimal_pdf_page_texts(p)                 # must not raise
        minimal_pdf_images(p, tmp_path / "o", 1)  # must not raise
