"""Synonym lexicon (train/lexicon.py), adversarial eval slice
(tools/sample_corpus.adversarial_pairs), synonym-augmented training pairs
(train/data.py), and the gate transfer check (retrieval/gate.py) —
VERDICT r3 next #1 and #7."""

import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.train import lexicon
from hybrid_rag_colbertv2_tpu.train.data import pseudo_query_pairs


def test_substitute_words_deterministic_first():
    out = lexicon.substitute_words(["sixty", "unknownword", "kernel"])
    assert out == ["60", "unknownword", "routine"]


def test_substitute_words_punctuation_preserved():
    # "(sixty" / "percent)" must still substitute on the alphabetic core
    out = lexicon.substitute_words(["(sixty", "five)", "percent."])
    assert out == ["(60", "5)", "pct."]


def test_substitute_words_multiword_synonym_splits():
    out = lexicon.substitute_words(["embedding"])
    assert out == ["vector", "representation"]
    # punctuation lands on the outer words of a multi-word replacement
    out = lexicon.substitute_words(["(embedding,"])
    assert out == ["(vector", "representation,"]


def test_substitute_random_uses_rng_and_prob():
    rng = np.random.default_rng(0)
    words = ["fast"] * 200
    out = lexicon.substitute_words(words, prob=0.5, rng=rng, pick="random")
    changed = sum(w != "fast" for w in out)
    assert 60 < changed < 140          # ~half substituted
    assert set(out) <= {"fast", "quick", "rapid"}
    with pytest.raises(ValueError):
        lexicon.substitute_words(["fast"], pick="random")


def test_lexicon_sentences_cover_vocabulary():
    text = " ".join(lexicon.lexicon_sentences())
    toks = set(text.split())
    for k, syns in list(lexicon.SYNONYMS.items())[:50]:
        assert k in toks
        for s in syns:
            assert all(w in toks for w in s.split())


def test_adversarial_pairs_unique_and_low_overlap():
    from hybrid_rag_colbertv2_tpu.index.textproc import tokenize_lexical
    from hybrid_rag_colbertv2_tpu.tools.sample_corpus import (
        adversarial_pairs, paraphrase_pairs)

    ap = adversarial_pairs()
    assert len(ap) == len(paraphrase_pairs())
    # every adversarial query maps to exactly one sentence
    seen = {}
    for q, s in ap:
        assert seen.setdefault(q, s) == s
    # the slice is lexically adversarial: stemmed-token overlap with the
    # source collapses vs the plain paraphrases (0.7 -> ~0.1 measured)
    def mean_overlap(pairs):
        vals = []
        for q, s in pairs[:300]:
            qt, st = set(tokenize_lexical(q)), set(tokenize_lexical(s))
            vals.append(len(qt & st) / max(1, len(qt)))
        return float(np.mean(vals))

    assert mean_overlap(ap) < 0.25
    assert mean_overlap(paraphrase_pairs()) > 0.5


def test_synonym_training_pairs_adversarial_by_construction():
    corpus = ["the fast kernel moved sixty gigabytes of memory traffic "
              "every training step through the matrix grid" for _ in
              range(4)]
    pairs = pseudo_query_pairs(corpus, n_pairs_per_doc=8, seed=0,
                               synonym_prob=1.0,
                               query_words=(4, 8))
    assert pairs
    changed = 0
    for q, i in pairs:
        src_words = set(corpus[i].split())
        changed += any(w not in src_words for w in q.split())
    assert changed >= len(pairs) // 2


def test_adversarial_eval_pairs_locate_chunks():
    from hybrid_rag_colbertv2_tpu.tools.eval_recall import \
        adversarial_eval_pairs
    from hybrid_rag_colbertv2_tpu.tools.sample_corpus import generate_corpus

    docs = generate_corpus(n_docs=8, seed=0)
    chunks = [line for d in docs for line in d.splitlines()
              if line and not line.startswith("#")]
    pairs = adversarial_eval_pairs(chunks)
    assert len(pairs) >= 20
    for q, ci in pairs:
        assert 0 <= ci < len(chunks)
        assert q not in chunks[ci]
    assert adversarial_eval_pairs(["unrelated"] * 4) == []


def test_gate_transfer_check(tmp_path):
    """validate_transfer re-measures the menu on a disjoint family and
    reports whether the picked entry stays in the noise band."""
    from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
    from hybrid_rag_colbertv2_tpu.config import RAGConfig
    from hybrid_rag_colbertv2_tpu.retrieval.gate import validate_transfer
    from hybrid_rag_colbertv2_tpu.tools.eval_recall import (
        adversarial_eval_pairs, paraphrase_eval_pairs)
    from hybrid_rag_colbertv2_tpu.tools.sample_corpus import write_corpus

    paths = write_corpus(tmp_path / "docs", n_docs=6, seed=0)
    cfg = RAGConfig(
        db_path=str(tmp_path / "rag.db"),
        bm25_index_path=str(tmp_path / "idx/bm25"),
        colbert_index_path=str(tmp_path / "idx/colbert"),
        tokenizer_path=str(tmp_path / "idx/tok.json"),
        images_dir=str(tmp_path / "img"),
        min_chunk_size=48, max_chunk_size=96, doc_max_tokens=96,
        encoder_preset="tiny", tokenizer_vocab_size=512,
    )
    app = RAGApplication(cfg, use_ollama=False)
    app.index_documents([str(p) for p in paths])
    app.resolve_final_fusion()
    corpus = app.store.all_chunk_texts()
    fam = paraphrase_eval_pairs(corpus) + adversarial_eval_pairs(corpus)
    assert fam
    picked = (app.config.final_fusion, app.config.fusion_weight_bm25)
    res = validate_transfer(app.config, app.indexes, app.encoder,
                            fam[:24], picked, chunk_store=app.store)
    assert 0.0 <= res["transfer_hit@10"] <= 1.0
    assert res["transfer_best"] >= res["transfer_hit@10"]
    assert isinstance(res["in_band"], bool)
    assert len(res["per_entry"]) >= 5
    # picked not in menu -> it is appended and still measured
    res2 = validate_transfer(app.config, app.indexes, app.encoder,
                             fam[:16], ("rrf", 0.6),
                             chunk_store=app.store)
    assert "rrf_w0.6" in res2["per_entry"]


def test_tie_synonym_embeddings():
    """Single-token synonym pairs start with identical embedding rows —
    the self-contained stand-in for a pretrained checkpoint's semantic
    prior (applied at fresh init by app/application._make_encoder)."""
    from hybrid_rag_colbertv2_tpu.models.colbert import (ColBERTConfig,
                                                         ColBERTEncoder)
    from hybrid_rag_colbertv2_tpu.models.tokenizer import ColBERTTokenizer
    from hybrid_rag_colbertv2_tpu.train.lexicon import (
        lexicon_sentences, tie_synonym_embeddings)

    corpus = ["the fast kernel moved sixty gigabytes of traffic"] * 8
    tok = ColBERTTokenizer.train_bpe(corpus + lexicon_sentences(),
                                     vocab_size=2048)
    enc = ColBERTEncoder(ColBERTConfig.tiny(vocab_size=tok.vocab_size), tok)
    n = tie_synonym_embeddings(enc.params, tok)
    assert n >= 50          # plenty of single-token pairs in a 2048 vocab
    e = np.asarray(enc.params["word_embeddings"]["embedding"])
    for a, b in (("sixty", "60"), ("fast", "quick")):
        ia, ib = tok._ids(a), tok._ids(b)
        if len(ia) == 1 and len(ib) == 1:
            np.testing.assert_allclose(e[ia[0]], e[ib[0]])
    # missing table -> no-op, returns 0
    assert tie_synonym_embeddings({}, tok) == 0
