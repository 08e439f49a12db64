"""HF torch checkpoint -> Flax param-tree converter.

Replaces the reference's ``model_downloader_simplified.py`` (pip install +
hub download + smoke tests) with a checkpoint conversion tool: given a
torch ``state_dict`` in XLM-RoBERTa naming (``XLMRobertaModel`` /
jina-colbert-v2's backbone), produce the param tree of
``models.colbert.ColBERTModel``. Conversion fidelity is tested against
torch ``XLMRobertaModel`` outputs with random weights (tests/test_encoder.py)
because this environment cannot download real checkpoints.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from .colbert import ColBERTConfig


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr


def convert_xlmr_state_dict(
    state: Mapping[str, "np.ndarray"],
    cfg: ColBERTConfig,
    projection_key: Optional[str] = None,
) -> Dict:
    """torch state_dict (XLMRobertaModel naming, with or without a leading
    'roberta.' prefix) -> Flax params for ColBERTModel.

    projection_key: state_dict key of the ColBERT linear head weight (e.g.
    'linear.weight'); if absent the head must be initialized separately.
    """
    sd = {k.removeprefix("roberta."): _t(v) for k, v in state.items()}

    def dense(prefix: str, bias: bool = True) -> Dict:
        p = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T)}
        if bias:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    def ln(prefix: str) -> Dict:
        return {
            "scale": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    params: Dict = {
        "word_embeddings": {
            "embedding": jnp.asarray(sd["embeddings.word_embeddings.weight"])
        },
        "embeddings_ln": ln("embeddings.LayerNorm"),
    }
    if cfg.position_embedding == "learned":
        params["position_embeddings"] = {
            "embedding": jnp.asarray(
                sd["embeddings.position_embeddings.weight"]
            )
        }
    if cfg.type_vocab_size and "embeddings.token_type_embeddings.weight" in sd:
        params["token_type_embeddings"] = {
            "embedding": jnp.asarray(
                sd["embeddings.token_type_embeddings.weight"]
            )
        }

    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{pre}.attention.self.query"),
                "key": dense(f"{pre}.attention.self.key"),
                "value": dense(f"{pre}.attention.self.value"),
                "out": dense(f"{pre}.attention.output.dense"),
            },
            "attention_ln": ln(f"{pre}.attention.output.LayerNorm"),
            "intermediate": dense(f"{pre}.intermediate.dense"),
            "output": dense(f"{pre}.output.dense"),
            "output_ln": ln(f"{pre}.output.LayerNorm"),
        }

    if projection_key and projection_key in sd:
        params["colbert_linear"] = {
            "kernel": jnp.asarray(sd[projection_key].T)
        }
    return params


def convert_hf_dir(model_dir: str, cfg: ColBERTConfig) -> Dict:
    """Load a local HF checkpoint directory (safetensors or pytorch_model.bin)
    and convert. Works fully offline when the files are present."""
    from pathlib import Path

    d = Path(model_dir)
    state = {}
    st_files = sorted(d.glob("*.safetensors"))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            state.update(load_file(str(f)))
    else:
        import torch

        bins = sorted(d.glob("pytorch_model*.bin"))
        if not bins:
            raise FileNotFoundError(f"no checkpoint files in {model_dir}")
        for f in bins:
            state.update(torch.load(str(f), map_location="cpu"))
    proj = next((k for k in ("linear.weight", "colbert_linear.weight")
                 if k in state), None)
    return convert_xlmr_state_dict(state, cfg, projection_key=proj)
