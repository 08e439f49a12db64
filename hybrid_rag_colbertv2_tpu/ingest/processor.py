"""Document ingestion pipeline.

TPU-side-aware equivalent of the reference's ``DocumentProcessor``
(local_rag_complete.py:472-708) — the same 5-step contract with structured
timing instead of prints:

  1. document -> markdown (:483-486; here any of pdf/md/txt, pdf.py)
  2. image extraction + vision analysis -> store (:488-556; vision client
     optional — ingestion proceeds without a sidecar)
  3. markdown-aware semantic chunking (:662-669; chunker.py)
  4. image-context enrichment (:671-683 — same keyword heuristic the
     reference ships, kept intentionally: chunks mentioning visual content
     get the document's image descriptions appended + has_images flag)
  5. persist chunks to the store (:685-706), returning their global corpus
     indexes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

from ..config import RAGConfig
from ..utils.logging import StageTimer, get_logger
from .chunker import ChunkerConfig, MarkdownChunker
from .pdf import document_to_markdown, extract_pdf_images
from .store import ChunkStore

log = get_logger(__name__)

# reference keyword list (local_rag_complete.py:579-580)
_VISUAL_KEYWORDS = (
    "figure", "image", "diagram", "chart", "screenshot",
    "see below", "shown in",
)


class DocumentProcessor:
    def __init__(
        self,
        config: RAGConfig,
        store: ChunkStore,
        vision_client=None,          # app/ollama.OllamaClient (optional)
        count_tokens=None,           # tokenizer hook for the chunker
    ):
        self.config = config
        self.store = store
        self.vision = vision_client
        self.chunker = MarkdownChunker(
            ChunkerConfig(
                min_tokens=config.min_chunk_size,
                max_tokens=config.max_chunk_size,
                overlap_tokens=config.chunk_overlap,
                level1_standalone=getattr(
                    config, "chunk_level1_standalone", True),
            ),
            count_tokens=count_tokens,
        )
        self.timer = StageTimer()

    # ------------------------------------------------------------------
    def _analyze_images(self, images: List[Dict], document_id: int
                        ) -> List[Dict]:
        """Vision analysis per image (reference analyze_images :522-556);
        skipped gracefully when no vision client is configured."""
        out: List[Dict] = []
        for info in images:
            analysis = {"description": "", "type": "unknown", "ocr_text": ""}
            if self.vision is not None:
                try:
                    analysis = self.vision.analyze_image(info["image_path"])
                except Exception as e:  # sidecar down — keep ingesting
                    log.warning("vision analysis failed for %s: %s",
                                info["image_path"], e)
            self.store.add_image(
                document_id=document_id,
                page_number=info["page_number"],
                image_path=info["image_path"],
                description=analysis["description"],
                image_type=analysis["type"],
                ocr_text=analysis["ocr_text"],
            )
            out.append({**info, **analysis})
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def enrich_chunks_with_images(chunks: List[Dict], images: List[Dict]
                                  ) -> List[Dict]:
        """Reference enrich_chunks_with_images (local_rag_complete.py:558-605)."""
        if not images:
            for c in chunks:
                c["has_images"] = False
            return chunks
        out = []
        for chunk in chunks:
            c = dict(chunk)
            lower = c["text"].lower()
            if any(k in lower for k in _VISUAL_KEYWORDS):
                lines = ["", "", "[Images in this section]:"]
                c["image_paths"] = []
                c["image_metadata"] = []
                for img in images:
                    typ = (img.get("type") or "unknown").capitalize()
                    lines.append(f"- {typ}: {img.get('description', '')}")
                    c["image_paths"].append(img["image_path"])
                    c["image_metadata"].append({
                        "path": img["image_path"],
                        "description": img.get("description", ""),
                        "type": img.get("type", "unknown"),
                    })
                c["text"] = c["text"] + "\n".join(lines) + "\n"
                c["has_images"] = True
            else:
                c["has_images"] = False
            out.append(c)
        return out

    # ------------------------------------------------------------------
    def process_document(self, path: str | Path
                         ) -> Tuple[List[Dict], int, List[int]]:
        """-> (chunks, document_id, corpus_indexes).

        Reference: process_document (local_rag_complete.py:607-708).
        """
        path = Path(path)
        log.info("Processing %s", path)

        with self.timer.stage("to_markdown"):
            markdown, pages = document_to_markdown(path)
        doc_id = self.store.add_document(path.name, total_pages=pages)

        with self.timer.stage("images"):
            raw_images = extract_pdf_images(path, self.config.images_dir,
                                            doc_id)
            images = self._analyze_images(raw_images, doc_id)

        with self.timer.stage("chunking"):
            doc_context = f"Document: {path.name}\n\n{markdown[:500]}"
            chunks = self.chunker.chunk(markdown, doc_context)

        with self.timer.stage("enrich"):
            chunks = self.enrich_chunks_with_images(chunks, images)

        with self.timer.stage("persist"):
            corpus_indexes = self.store.add_chunks(doc_id, chunks)
            self.store.set_document_status(doc_id, "indexed")

        log.info(
            "Processed %s: %d pages, %d images, %d chunks\n%s",
            path.name, pages, len(images), len(chunks), self.timer.summary(),
        )
        return chunks, doc_id, corpus_indexes
