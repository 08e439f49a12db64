"""Golden-manifest test pinning the published jinaai/jina-colbert-v2
state_dict layout (VERDICT r2 next #5).

The reference loads that checkpoint directly
(/root/reference/local_rag_complete.py:718-724); this environment cannot
download it, so the exact key names + shapes of its state_dict are
hardcoded here (jina-xlm-roberta rotary flash backbone under a ``bert.``
prefix + ``linear.weight`` ColBERT head). ``convert_state_dict(strict=True)``
must consume exactly this manifest — if models/convert.py's layout
assumptions ever drift from the real artifact, these tests fail.

Zero-stride broadcast views keep the fake 560M-parameter state_dict free to
build; the full-size conversion still materializes ~1.2 GB of fp16 params
once (a single test); strict-mode mechanics are covered at tiny geometry.
"""

import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.models.colbert import ColBERTConfig
from hybrid_rag_colbertv2_tpu.models.convert import (convert_state_dict,
                                                     is_flash_layout)

H, I, L, V, DIM = 1024, 4096, 24, 250002, 128       # jina-colbert-v2

_TINY = dict(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
             intermediate_size=64, colbert_dim=16,
             position_embedding="rope")


def flash_manifest(h=H, i_=I, n_layers=L, v=V, dim=DIM):
    """[(key, shape)] of a flash-layout ColBERT checkpoint; defaults are
    the published jina-colbert-v2 tensor set."""
    m = [
        ("bert.embeddings.word_embeddings.weight", (v, h)),
        ("bert.embeddings.token_type_embeddings.weight", (1, h)),
        ("bert.emb_ln.weight", (h,)),
        ("bert.emb_ln.bias", (h,)),
        ("linear.weight", (dim, h)),
    ]
    for li in range(n_layers):
        pre = f"bert.encoder.layers.{li}"
        m += [
            (f"{pre}.mixer.Wqkv.weight", (3 * h, h)),
            (f"{pre}.mixer.Wqkv.bias", (3 * h,)),
            (f"{pre}.mixer.out_proj.weight", (h, h)),
            (f"{pre}.mixer.out_proj.bias", (h,)),
            (f"{pre}.norm1.weight", (h,)),
            (f"{pre}.norm1.bias", (h,)),
            (f"{pre}.norm2.weight", (h,)),
            (f"{pre}.norm2.bias", (h,)),
            (f"{pre}.mlp.fc1.weight", (i_, h)),
            (f"{pre}.mlp.fc1.bias", (i_,)),
            (f"{pre}.mlp.fc2.weight", (h, i_)),
            (f"{pre}.mlp.fc2.bias", (h,)),
        ]
    return m


def _state(manifest, extra=()):
    st = {k: np.broadcast_to(np.float16(0), shape) for k, shape in manifest}
    for k, shape in extra:
        st[k] = np.broadcast_to(np.float16(0), shape)
    return st


def _tiny_manifest():
    t = _TINY
    return flash_manifest(h=t["hidden_size"], i_=t["intermediate_size"],
                          n_layers=t["num_layers"], v=t["vocab_size"],
                          dim=t["colbert_dim"])


def test_manifest_matches_preset_geometry():
    """Two-way drift check: the hardcoded manifest shapes must agree with
    ColBERTConfig.jina_colbert_v2()'s geometry."""
    cfg = ColBERTConfig.jina_colbert_v2()
    assert (cfg.vocab_size, cfg.hidden_size, cfg.num_layers,
            cfg.intermediate_size, cfg.colbert_dim) == (V, H, L, I, DIM)
    assert cfg.position_embedding == "rope"   # no position table expected
    keys = {k for k, _ in flash_manifest()}
    assert not any("position_embeddings" in k for k in keys)
    assert len(keys) == 5 + 12 * L


def test_strict_conversion_consumes_exact_real_manifest():
    """THE golden test: the full published tensor set (real shapes), no
    missing and no unconsumed keys."""
    cfg = ColBERTConfig.jina_colbert_v2()
    state = _state(flash_manifest())
    assert is_flash_layout(state)
    params = convert_state_dict(state, cfg, projection_key="linear.weight",
                                strict=True)
    # spot-check the converted tree's shapes (torch (out,in) -> flax (in,out))
    assert params["word_embeddings"]["embedding"].shape == (V, H)
    assert params["colbert_linear"]["kernel"].shape == (H, DIM)
    l0 = params["layer_0"]
    assert l0["attention"]["query"]["kernel"].shape == (H, H)
    assert l0["attention"]["query"]["bias"].shape == (H,)
    assert l0["intermediate"]["kernel"].shape == (H, I)
    assert l0["output"]["kernel"].shape == (I, H)
    assert f"layer_{L - 1}" in params and f"layer_{L}" not in params
    assert "position_embeddings" not in params     # rotary: no table


def test_strict_flags_unconsumed_keys():
    cfg = ColBERTConfig(**_TINY)
    h = _TINY["hidden_size"]
    state = _state(_tiny_manifest(),
                   extra=[("bert.encoder.layers.0.mixer.Wqkv_lora.weight",
                           (8, h))])
    with pytest.raises(ValueError, match="consumed"):
        convert_state_dict(state, cfg, projection_key="linear.weight",
                           strict=True)
    # and a missing required key still fails loudly
    state2 = _state(_tiny_manifest())
    del state2["bert.encoder.layers.1.mixer.Wqkv.weight"]
    with pytest.raises(KeyError):
        convert_state_dict(state2, cfg, projection_key="linear.weight",
                           strict=True)


def test_strict_tolerates_ignored_buffers():
    """rotary inv_freq buffers + pooler may appear in real dumps; they are
    deliberately ignored (recomputed from config / unused by ColBERT)."""
    cfg = ColBERTConfig(**_TINY)
    h = _TINY["hidden_size"]
    head_dim = h // _TINY["num_heads"]
    extra = [(f"bert.encoder.layers.{i}.mixer.rotary_emb.inv_freq",
              (head_dim // 2,)) for i in range(_TINY["num_layers"])]
    extra += [("bert.pooler.dense.weight", (h, h)),
              ("bert.pooler.dense.bias", (h,))]
    params = convert_state_dict(_state(_tiny_manifest(), extra), cfg,
                                projection_key="linear.weight", strict=True)
    assert "colbert_linear" in params
