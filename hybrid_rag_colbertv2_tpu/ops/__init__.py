from .maxsim import (  # noqa: F401
    maxsim_scores_exact,
    maxsim_scores,
    maxsim_scores_int4_doc,
    maxsim_scores_int8,
    maxsim_scores_int8_doc,
)
from .fusion import reciprocal_rank_fusion, rrf_from_topk  # noqa: F401
from .bm25 import bm25_scores_device, bm25_topk_device  # noqa: F401
from .prefilter import (  # noqa: F401
    approx_or_exact_topk,
    candidate_sims,
    maxsim_topk_pruned,
    pooled_doc_embeddings,
)
from .quant import (  # noqa: F401
    dequantize_int4_groups,
    dequantize_int8_rows,
    int4_group_size,
    quantize_int4_groups,
    quantize_int8_rows,
    unpack_int4,
    unpack_int4_pairs,
)
