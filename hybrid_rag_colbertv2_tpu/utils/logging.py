"""Structured logging + per-stage timing.

The reference instruments every stage with ``time.time()`` brackets and raw
``print`` lines (retrieval stages local_rag_complete.py:901-933, indexing
steps :618-706). Here the same per-stage timing is a reusable ``StageTimer``
that records structured metrics (name -> seconds) and can emit them as JSON,
instead of scattered prints.
"""

from __future__ import annotations

import json
import logging
import os
import time
from contextlib import contextmanager
from typing import Dict, Iterator


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("HRAG_LOG_LEVEL", "INFO"))
        logger.propagate = False
    return logger


class StageTimer:
    """Accumulates wall-clock timings per named stage.

    Mirrors the reference's per-stage timing surface (BM25s / ColBERT /
    Fusion / Fetch / Rerank lines, local_rag_complete.py:901-933) as
    structured data.
    """

    def __init__(self) -> None:
        self.timings: Dict[str, float] = {}

    @contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def snapshot(self) -> Dict[str, float]:
        """Current cumulative totals — pair with :meth:`delta` to carve a
        per-call split out of a long-lived timer (the reference prints
        per-retrieve stage lines, local_rag_complete.py:901-933; this
        keeps that surface without resetting the cumulative stats)."""
        return dict(self.timings)

    def delta(self, snap: Dict[str, float]) -> Dict[str, float]:
        """Stage seconds accrued since ``snap`` (zero-change stages
        omitted)."""
        return {k: round(v - snap.get(k, 0.0), 6)
                for k, v in self.timings.items()
                if v - snap.get(k, 0.0) > 0.0}

    @property
    def total(self) -> float:
        return sum(self.timings.values())

    def as_json(self) -> str:
        d = dict(self.timings)
        d["total"] = self.total
        return json.dumps(d)

    def summary(self) -> str:
        lines = [f"  - {k}: {v:.4f}s" for k, v in self.timings.items()]
        lines.append(f"  = total: {self.total:.4f}s")
        return "\n".join(lines)
