"""Profiling / tracing hooks.

The reference's only observability is wall-clock prints (SURVEY.md section
5). Here: (a) StageTimer (utils/logging.py) gives structured per-stage
timings; (b) this module wraps ``jax.profiler`` so any retrieval/training
call can be traced to a TensorBoard-readable directory; (c) device memory
introspection for index-capacity planning.
"""

from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax

from .logging import get_logger

log = get_logger(__name__)


@contextlib.contextmanager
def trace(trace_dir: str | Path = "/tmp/hrag_trace") -> Iterator[None]:
    """jax.profiler trace around a block:

        with profiling.trace("/tmp/trace"):
            retriever.retrieve_batch(queries)
    """
    Path(trace_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(trace_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", trace_dir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-span visible in the trace viewer."""
    with jax.profiler.TraceAnnotation(name):
        yield


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device live/limit bytes where the backend exposes them."""
    out: Dict[str, Dict[str, int]] = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            if stats:
                out[str(d)] = {
                    "bytes_in_use": stats.get("bytes_in_use", -1),
                    "bytes_limit": stats.get("bytes_limit", -1),
                }
        except Exception:
            continue
    return out


def index_capacity_estimate(n_docs: int, doc_len: int, dim: int = 128,
                            dtype_bytes: int = 1,
                            n_devices: Optional[int] = None) -> Dict:
    """How much HBM an index needs and whether it fits the mesh."""
    n_devices = n_devices or len(jax.devices())
    emb = n_docs * doc_len * dim * dtype_bytes
    scales = n_docs * doc_len * 4 if dtype_bytes == 1 else 0
    total = emb + scales + n_docs * 4
    mem = device_memory_stats()
    limits = [v["bytes_limit"] for v in mem.values() if v["bytes_limit"] > 0]
    per_device = total / n_devices
    return {
        "index_bytes": total,
        "per_device_bytes": int(per_device),
        "devices": n_devices,
        "fits": (per_device < min(limits) * 0.8) if limits else None,
    }
