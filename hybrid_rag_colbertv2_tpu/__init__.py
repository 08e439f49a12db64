"""hybrid_rag_colbertv2_tpu — a TPU-native hybrid retrieval framework.

A brand-new JAX / XLA / Pallas / pjit implementation of the capabilities of
``techmum21p/hybrid-rag-ColBERTv2`` (reference: ``local_rag_complete.py``):

- PDF -> markdown ingestion with image extraction + vision analysis
  (reference ``DocumentProcessor``, local_rag_complete.py:472-708)
- markdown-aware semantic chunking (reference ``MarkdownSemanticChunker``,
  local_rag_complete.py:240-465)
- dual indexes: BM25 lexical + ColBERT token-level dense
  (reference ``DualIndexer``, local_rag_complete.py:838-879)
- three-stage hybrid cascade: BM25 top-100 + ColBERT top-100 -> RRF(k=60)
  -> top-50 -> ColBERT rerank -> top-10 (reference ``HybridRetriever``,
  local_rag_complete.py:886-1014)
- chatbot with numbered source citations over a local-LLM HTTP sidecar
  (reference ``RAGChatbot`` / ``OllamaClient``)

Unlike the reference (single-process CPU/MPS Python), the retrieval hot path
here is TPU-native: a jitted Flax ColBERT encoder emitting token embeddings,
an HBM-resident padded ``(doc, token, dim)`` index scored by a Pallas tiled
true-MaxSim kernel, an on-device sparse BM25 scoring kernel, and fused
RRF + top-k selection — shardable across an ICI mesh with per-shard top-k and
allgather-of-candidates before fusion.
"""

__version__ = "0.1.0"

from .config import RAGConfig, MeshConfig  # noqa: F401
