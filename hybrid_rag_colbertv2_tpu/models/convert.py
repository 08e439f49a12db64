"""HF torch checkpoint -> Flax param-tree converter.

Replaces the reference's ``model_downloader_simplified.py`` (pip install +
hub download + smoke tests) with a checkpoint conversion tool. Two source
namings are supported, auto-detected by ``convert_state_dict``:

  * vanilla ``XLMRobertaModel`` naming (learned positions, separate
    query/key/value projections) — ``convert_xlmr_state_dict``;
  * the **jina-xlm-roberta rotary flash layout** that the real
    ``jinaai/jina-colbert-v2`` checkpoint uses (the encoder the reference
    actually loads, local_rag_complete.py:718-724): fused
    ``encoder.layers.{i}.mixer.Wqkv``, ``mixer.out_proj``, ``mlp.fc1/fc2``,
    ``norm1/norm2``, top-level ``emb_ln``, and NO position-embedding table
    (rotary) — ``convert_flash_state_dict``.

Backbone prefixes ``roberta.`` / ``bert.`` / ``model.`` are stripped (the
ColBERT wrapper checkpoints store the backbone under ``bert.`` next to the
``linear.weight`` projection head). Conversion fidelity of both layouts is
tested against torch references with random weights (tests/test_encoder.py)
because this environment cannot download real checkpoints.
"""

from __future__ import annotations

import json
from typing import Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from .colbert import ColBERTConfig

_PREFIXES = ("roberta.", "bert.", "model.")

# State-dict keys the converters deliberately ignore: rotary inverse-
# frequency buffers are recomputed from config (rope_base), and the
# pooler head plays no part in ColBERT token embeddings.
_IGNORED_SUBSTRINGS = ("rotary_emb.inv_freq",)
_IGNORED_PREFIXES = ("pooler.",)


def _is_ignored(key: str) -> bool:
    return (any(s in key for s in _IGNORED_SUBSTRINGS)
            or any(key.startswith(p) for p in _IGNORED_PREFIXES))


class _TrackingDict(dict):
    """Dict recording which keys were actually READ (getitem/get) —
    membership tests don't count. Lets strict conversion prove the source
    layout was consumed exactly (golden-manifest tests)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        self.used.add(k)
        return super().get(k, default)


def _check_consumed(sd: "_TrackingDict", strict: bool) -> None:
    if not strict:
        return
    unused = {k for k in sd
              if k not in sd.used and not _is_ignored(k)}
    if unused:
        raise ValueError(
            f"strict conversion: {len(unused)} state_dict keys were not "
            f"consumed (layout drift?): {sorted(unused)[:8]}...")


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr


def _strip(key: str) -> str:
    for p in _PREFIXES:
        if key.startswith(p):
            return key[len(p):]
    return key


def convert_xlmr_state_dict(
    state: Mapping[str, "np.ndarray"],
    cfg: ColBERTConfig,
    projection_key: Optional[str] = None,
    strict: bool = False,
) -> Dict:
    """torch state_dict (XLMRobertaModel naming, with or without a leading
    'roberta.' prefix) -> Flax params for ColBERTModel.

    projection_key: state_dict key of the ColBERT linear head weight (e.g.
    'linear.weight'); if absent the head must be initialized separately.
    strict: raise if any source key is left unconsumed (layout drift).
    """
    sd = _TrackingDict({_strip(k): _t(v) for k, v in state.items()})

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
    _check_consumed(sd, strict)
    return params


def convert_flash_state_dict(
    state: Mapping[str, "np.ndarray"],
    cfg: ColBERTConfig,
    projection_key: Optional[str] = None,
    strict: bool = False,
) -> Dict:
    """jina-xlm-roberta rotary flash state_dict -> Flax ColBERTModel params.

    Layout (the real jinaai/jina-colbert-v2 backbone):
      embeddings.word_embeddings.weight      (V, H)
      embeddings.token_type_embeddings.weight  (T, H)   [when T > 0]
      emb_ln.{weight,bias}                   (H,)
      encoder.layers.{i}.mixer.Wqkv.{weight (3H, H), bias (3H,)}  fused q;k;v
      encoder.layers.{i}.mixer.out_proj.{weight (H, H), bias}
      encoder.layers.{i}.norm1.{weight,bias}   post-attention LayerNorm
      encoder.layers.{i}.norm2.{weight,bias}   post-MLP LayerNorm
      encoder.layers.{i}.mlp.fc1.{weight (I, H), bias}
      encoder.layers.{i}.mlp.fc2.{weight (H, I), bias}
    No position-embedding table: positions are rotary, applied inside the
    attention (ColBERTModel's "rope" mode; rotate-halves convention,
    cfg.rope_interleaved=False). ``rotary_emb.inv_freq`` buffers and the
    pooler are ignored.
    """
    sd = _TrackingDict({_strip(k): _t(v) for k, v in state.items()})
    h = cfg.hidden_size

    def dense_t(key: str) -> Dict:
        p = {"kernel": jnp.asarray(sd[f"{key}.weight"].T)}
        if f"{key}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{key}.bias"])
        return p

    def ln(key: str) -> Dict:
        return {"scale": jnp.asarray(sd[f"{key}.weight"]),
                "bias": jnp.asarray(sd[f"{key}.bias"])}

    params: Dict = {
        "word_embeddings": {
            "embedding": jnp.asarray(sd["embeddings.word_embeddings.weight"])
        },
        "embeddings_ln": ln("emb_ln"),
    }
    if cfg.position_embedding == "learned":
        raise ValueError(
            "flash checkpoints are rotary; cfg.position_embedding must be "
            "'rope' (got 'learned')")
    if cfg.type_vocab_size and "embeddings.token_type_embeddings.weight" in sd:
        params["token_type_embeddings"] = {
            "embedding": jnp.asarray(
                sd["embeddings.token_type_embeddings.weight"])
        }

    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        wqkv = sd[f"{pre}.mixer.Wqkv.weight"]          # (3H, H) = [q; k; v]
        bqkv = sd.get(f"{pre}.mixer.Wqkv.bias")        # (3H,)
        att = {}
        for j, name in enumerate(("query", "key", "value")):
            p = {"kernel": jnp.asarray(wqkv[j * h:(j + 1) * h].T)}
            if bqkv is not None:
                p["bias"] = jnp.asarray(bqkv[j * h:(j + 1) * h])
            att[name] = p
        att["out"] = dense_t(f"{pre}.mixer.out_proj")
        params[f"layer_{i}"] = {
            "attention": att,
            "attention_ln": ln(f"{pre}.norm1"),
            "intermediate": dense_t(f"{pre}.mlp.fc1"),
            "output": dense_t(f"{pre}.mlp.fc2"),
            "output_ln": ln(f"{pre}.norm2"),
        }

    if projection_key and projection_key in sd:
        params["colbert_linear"] = {"kernel": jnp.asarray(sd[projection_key].T)}
    _check_consumed(sd, strict)
    return params


def is_flash_layout(state: Mapping[str, "np.ndarray"]) -> bool:
    return any(
        _strip(k).startswith("emb_ln.") or ".mixer.Wqkv." in k
        for k in state
    )


def convert_state_dict(
    state: Mapping[str, "np.ndarray"],
    cfg: ColBERTConfig,
    projection_key: Optional[str] = None,
    strict: bool = False,
) -> Dict:
    """Auto-detect the source naming and convert.

    ``strict=True`` additionally requires every source key to be consumed
    (modulo deliberately-ignored rotary inv_freq buffers and the pooler) —
    the golden-manifest tests use this to pin the published checkpoint
    layout (tests/test_convert_manifest.py)."""
    if is_flash_layout(state):
        return convert_flash_state_dict(state, cfg, projection_key, strict)
    return convert_xlmr_state_dict(state, cfg, projection_key, strict)


def colbert_config_from_hf(model_dir: str, **overrides) -> ColBERTConfig:
    """Build a ColBERTConfig from an HF checkpoint dir's config.json.

    Handles both vanilla XLM-RoBERTa configs (absolute positions) and the
    jina-xlm-roberta flash config (``rotary_emb_base`` /
    ``position_embedding_type: "rotary"``). ``overrides`` win over the
    file (e.g. colbert_dim, query/doc token budgets)."""
    from pathlib import Path

    hf = json.loads((Path(model_dir) / "config.json").read_text())
    rotary = ("rotary_emb_base" in hf
              or hf.get("position_embedding_type") in ("rotary", "rope"))
    kw = dict(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_layers=hf.get("num_hidden_layers", hf.get("num_layers", 24)),
        num_heads=hf.get("num_attention_heads", 16),
        intermediate_size=hf.get("intermediate_size", 4096),
        max_position_embeddings=hf.get("max_position_embeddings", 8194),
        type_vocab_size=hf.get("type_vocab_size", 1),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
        pad_token_id=hf.get("pad_token_id", 1),
        position_embedding="rope" if rotary else "learned",
        rope_base=float(hf.get("rotary_emb_base", 10000.0)),
        rope_interleaved=bool(hf.get("rotary_emb_interleaved", False)),
        # ColBERT wrapper configs sometimes carry the projection dim
        colbert_dim=int(hf.get("dim", 128)),
    )
    kw.update(overrides)
    return ColBERTConfig(**kw)


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
    return convert_state_dict(state, cfg, projection_key=proj)
