"""Encoder fidelity: the Flax backbone must reproduce torch
XLMRobertaModel outputs through the checkpoint converter (random weights —
no network in this environment), plus ColBERT-protocol invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.models.colbert import (
    ColBERTConfig,
    ColBERTEncoder,
    ColBERTModel,
)
from hybrid_rag_colbertv2_tpu.models.convert import convert_xlmr_state_dict
from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "TPUs multiply matrices using a systolic array called the MXU.",
    "JAX compiles numerical programs with XLA for TPUs and GPUs.",
    "Information retrieval ranks documents by relevance to a query.",
] * 4


@pytest.fixture(scope="module")
def tok():
    return ColBERTTokenizer.train_bpe(CORPUS, vocab_size=512)


def test_backbone_matches_torch_xlmr():
    import torch
    from transformers import XLMRobertaConfig, XLMRobertaModel

    hf_cfg = XLMRobertaConfig(
        vocab_size=200, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5, hidden_act="gelu",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    tmodel = XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = ColBERTConfig(
        vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        type_vocab_size=1, colbert_dim=16, position_embedding="learned",
    )
    params = convert_xlmr_state_dict(tmodel.state_dict(), cfg)
    # add a known projection so we can compare through the full model
    rngk = np.random.default_rng(0)
    proj = rngk.standard_normal((32, 16)).astype(np.float32) * 0.1
    params["colbert_linear"] = {"kernel": jnp.asarray(proj)}

    ids = np.array([[0, 5, 9, 17, 33, 2, 1, 1],
                    [0, 7, 21, 2, 1, 1, 1, 1]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 1, 0, 0],
                     [1, 1, 1, 1, 0, 0, 0, 0]], np.int64)
    with torch.no_grad():
        t_out = tmodel(torch.tensor(ids),
                       attention_mask=torch.tensor(mask)).last_hidden_state
    t_emb = t_out.numpy() @ proj
    t_emb = t_emb / np.maximum(
        np.linalg.norm(t_emb, axis=-1, keepdims=True), 1e-12)
    t_emb = t_emb * mask[..., None]

    model = ColBERTModel(cfg)
    j_emb = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                        jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(j_emb), t_emb, rtol=2e-4, atol=2e-5)


def test_encoder_invariants(tok):
    cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    enc = ColBERTEncoder(cfg, tok, seed=0)
    q = enc.encode_queries(["what is a systolic array?"])
    assert q.shape == (1, cfg.query_max_tokens, cfg.colbert_dim)
    norms = np.linalg.norm(np.asarray(q[0]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)  # all rows live (aug)

    embs, lengths = enc.encode_docs(CORPUS[:5], doc_len=64)
    assert embs.shape == (5, 64, cfg.colbert_dim)
    for i in range(5):
        n = int(lengths[i])
        norms = np.linalg.norm(np.asarray(embs[i]), axis=-1)
        np.testing.assert_allclose(norms[:n], 1.0, rtol=1e-4)
        np.testing.assert_allclose(norms[n:], 0.0, atol=1e-6)  # zero padding


def test_query_doc_markers_differ(tok):
    """Same text as query vs doc must encode differently (marker tokens)."""
    cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    enc = ColBERTEncoder(cfg, tok, seed=0)
    q = enc.encode_queries(["systolic array"])
    d, lens = enc.encode_docs(["systolic array"], doc_len=cfg.query_max_tokens)
    assert not np.allclose(np.asarray(q[0, 1]), np.asarray(d[0, 1]))


def test_rope_mode_runs(tok):
    cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size,
                             position_embedding="rope")
    enc = ColBERTEncoder(cfg, tok, seed=0)
    q = enc.encode_queries(["fox", "dog"])
    assert q.shape[0] == 2
    assert np.isfinite(np.asarray(q)).all()


def test_params_save_load_roundtrip(tok, tmp_path):
    cfg = ColBERTConfig.tiny(vocab_size=tok.vocab_size)
    enc = ColBERTEncoder(cfg, tok, seed=0)
    p = tmp_path / "params.npz"
    enc.save_params(str(p))
    params2 = ColBERTEncoder.load_params(str(p))
    enc2 = ColBERTEncoder(cfg, tok, params=params2)
    q1 = enc.encode_queries(["fox jumps"])
    q2 = enc2.encode_queries(["fox jumps"])
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)


def test_tokenizer_roundtrip_and_protocol(tok):
    ids = tok.encode_query("quick brown fox", 16)
    assert ids[0] == tok.bos and ids[1] == tok.qmark
    assert (ids == tok.mask).sum() > 0  # augmentation happened
    dids, n = tok.encode_doc("quick brown fox", 16)
    assert dids[0] == tok.bos and dids[1] == tok.dmark
    assert n < 16 and (dids[n:] == tok.pad).all()
    # counting is consistent with encoding
    assert tok.count_tokens("quick brown fox") == n - 3
