"""Measured final-fusion gate (retrieval/gate.py), paraphrase eval pairs
(tools/eval_recall.py), and word-dropout ICT queries (train/data.py)."""

import numpy as np
import pytest

from hybrid_rag_colbertv2_tpu.config import RAGConfig, effective_final_fusion
from hybrid_rag_colbertv2_tpu.train.data import pseudo_query_pairs


def test_config_auto_is_default_and_validates():
    cfg = RAGConfig()
    assert cfg.final_fusion == "auto"
    cfg.validate()                      # "auto" is a legal value
    assert effective_final_fusion(cfg) == "rerank"   # unresolved -> parity
    cfg.final_fusion = "rrf"
    assert effective_final_fusion(cfg) == "rrf"
    cfg.final_fusion = "blend"
    with pytest.raises(ValueError, match="final_fusion"):
        cfg.validate()


def test_word_dropout_queries_not_verbatim():
    corpus = [" ".join(f"w{i}_{j}" for j in range(30)) for i in range(20)]
    exact = pseudo_query_pairs(corpus, n_pairs_per_doc=2, seed=3)
    dropped = pseudo_query_pairs(corpus, n_pairs_per_doc=2, seed=3,
                                 word_dropout=0.4)
    # verbatim: every query is a substring of its source
    assert all(q in corpus[i] for q, i in exact)
    # dropout: a good fraction are NOT substrings anymore, but every
    # query keeps only words FROM the source and >= 3 of them
    non_verbatim = sum(q not in corpus[i] for q, i in dropped)
    assert non_verbatim >= len(dropped) // 4
    for q, i in dropped:
        words = q.split()
        assert len(words) >= 3
        assert all(w in corpus[i].split() for w in words)


def test_paraphrase_eval_pairs_map_to_unique_chunks():
    from hybrid_rag_colbertv2_tpu.tools.eval_recall import \
        paraphrase_eval_pairs
    from hybrid_rag_colbertv2_tpu.tools.sample_corpus import generate_corpus

    docs = generate_corpus(n_docs=8, seed=0)
    # treat each section paragraph as a "chunk" (prose lines only)
    chunks = [line for d in docs for line in d.splitlines()
              if line and not line.startswith("#")]
    pairs = paraphrase_eval_pairs(chunks)
    assert len(pairs) >= 20
    for q, ci in pairs:
        assert 0 <= ci < len(chunks)
        assert q not in chunks[ci]      # genuinely non-verbatim
    # no paraphrases for an unrelated corpus
    assert paraphrase_eval_pairs(["totally unrelated text"] * 4) == []


@pytest.fixture(scope="module")
def small_app(tmp_path_factory):
    from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
    from hybrid_rag_colbertv2_tpu.tools.sample_corpus import write_corpus

    td = tmp_path_factory.mktemp("gate_app")
    paths = write_corpus(td / "docs", n_docs=6, seed=0)
    cfg = RAGConfig(
        db_path=str(td / "rag.db"),
        bm25_index_path=str(td / "idx/bm25"),
        colbert_index_path=str(td / "idx/colbert"),
        tokenizer_path=str(td / "idx/tok.json"),
        images_dir=str(td / "img"),
        min_chunk_size=48, max_chunk_size=96, doc_max_tokens=96,
        encoder_preset="tiny", tokenizer_vocab_size=512,
    )
    app = RAGApplication(cfg, use_ollama=False)
    app.index_documents([str(p) for p in paths])
    return app


def test_gate_resolves_auto_and_records_measurement(small_app):
    from hybrid_rag_colbertv2_tpu.retrieval.gate import GATE_MENU

    app = small_app
    assert app.config.final_fusion == "auto"
    mode = app.resolve_final_fusion()
    assert mode in ("rerank", "rrf", "union")
    assert app.config.final_fusion == mode           # resolved in place
    g = app.fusion_gate
    assert g["picked"] == mode
    assert app.config.fusion_weight_bm25 == g["picked_weight"]
    hits = {(m, w): g[f"mean_hit_{m}_w{w}"] for m, w in GATE_MENU}
    assert all(0.0 <= h <= 1.0 for h in hits.values())
    # per-regime breakdown is recorded and the winner satisfies the
    # minimax-regret rule: its worst regret over regimes is within the
    # one-query band of the smallest worst regret. The recorded hits are
    # rounded to 3 decimals, so allow 2x the rounding step on top of the
    # one-query band (the gate itself selects on unrounded values).
    assert set(g["regimes"]) <= {"verbatim", "long_verbatim", "dropout",
                                 "synonym", "reworded"} and g["regimes"]
    # the round-5 regimes: reworded is present, long_verbatim measures
    # its saturation-proof hit@3 bar
    assert "reworded" in g["regimes"]
    assert g["regime_k"]["long_verbatim"] == 3
    regret = {e: 0.0 for e in GATE_MENU}
    for rh in g["regimes"].values():
        best = max(rh.values())
        for m, w in GATE_MENU:
            regret[(m, w)] = max(regret[(m, w)], best - rh[f"{m}_w{w}"])
    eps = 1.0 / min(g["n_by_regime"].values()) + 2e-3
    assert (regret[(mode, g["picked_weight"])]
            <= min(regret.values()) + eps)
    # idempotent: second call is a no-op returning the same mode
    assert app.resolve_final_fusion() == mode


def test_gate_skips_tiny_corpora():
    from hybrid_rag_colbertv2_tpu.retrieval.gate import resolve_final_fusion

    # below the measurement floor the gate ships the robust lexical-lean
    # entry (dense as tie-breaker only) — on tiny corpora the corpus-
    # trained dense leg is unreliable and BM25 is near-exact matching
    (mode, weight), details = resolve_final_fusion(
        RAGConfig(), None, None, ["just one chunk"])
    assert mode == "rrf" and weight == 0.9 and "reason" in details
    # a user-pinned weight survives the fallback
    (mode, weight), _ = resolve_final_fusion(
        RAGConfig(), None, None, ["just one chunk"], fixed_weight=0.6)
    assert mode == "rrf" and weight == 0.6


def test_bind_retriever_resolves_gate(small_app):
    app = small_app
    app.initialize_chatbot(use_mesh=False)
    assert app.config.final_fusion in ("rerank", "rrf", "union")
    res = app.query("how occupied was the matrix engine", top_k=3)
    assert isinstance(res, list)


def test_gate_verdict_persists_and_invalidates(tmp_path):
    """The measured verdict must persist next to the index (a second
    process loads it instead of re-measuring) and be invalidated by
    re-indexing, which re-arms 'auto' so calibration follows the new
    index."""
    import dataclasses

    from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
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
    mode = app.resolve_final_fusion()
    gp = app._gate_path()
    assert gp.exists()
    saved = __import__("json").loads(gp.read_text())
    assert saved["details"]["picked"] == mode
    assert saved["pinned_weight"] is None
    assert saved["config_fp"]["dense_prefilter"] == cfg.dense_prefilter

    # a FRESH process (new config object) loads the verdict — no re-measure
    cfg2 = dataclasses.replace(cfg, final_fusion="auto",
                               fusion_weight_bm25=0.5)
    app2 = RAGApplication(cfg2, use_ollama=False)
    app2.initialize_chatbot(use_mesh=False)
    assert app2.config.final_fusion == mode
    assert app2.fusion_gate == saved["details"]

    # re-indexing invalidates the verdict and re-arms auto for the
    # gate-resolved app; the next bind re-measures and re-persists
    extra = write_corpus(tmp_path / "docs2", n_docs=2, seed=1)
    app2.index_documents([str(p) for p in extra])
    assert gp.exists()          # re-bound -> re-measured -> re-persisted
    saved2 = __import__("json").loads(gp.read_text())
    assert saved2["n_chunks"] > saved["n_chunks"]


def test_pinned_weight_survives_gate(tmp_path):
    """--fusion-weight-bm25 pinning: the gate may choose the ordering
    mode but must NOT override the pinned weight."""
    from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
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
        fusion_weight_bm25=0.75, fusion_weight_pinned=True,
    )
    app = RAGApplication(cfg, use_ollama=False)
    app.index_documents([str(p) for p in paths])
    mode = app.resolve_final_fusion()
    assert mode in ("rerank", "rrf", "union")
    assert app.config.fusion_weight_bm25 == 0.75      # never overridden
    # the gate only measured the two modes at the pinned weight
    assert set(k for k in app.fusion_gate if k.startswith("mean_hit")) == {
        "mean_hit_rerank_w0.75", "mean_hit_rrf_w0.75"}
    # a pinned-run verdict must NOT be adopted by an unpinned process
    # (restricted menu != the full-menu calibration it promises)
    import dataclasses

    cfg2 = dataclasses.replace(cfg, final_fusion="auto",
                               fusion_weight_bm25=0.5,
                               fusion_weight_pinned=False)
    from hybrid_rag_colbertv2_tpu.app.application import \
        RAGApplication as _App

    app2 = _App(cfg2, use_ollama=False)
    app2.initialize_chatbot(use_mesh=False)
    # full menu re-measured: entries beyond the pinned pair are present
    assert any(k.startswith("mean_hit_rrf_w0.9")
               for k in app2.fusion_gate), app2.fusion_gate


def test_config_file_weight_is_pinned():
    """A non-default fusion_weight_bm25 in a config FILE pins it, same as
    the CLI flag; a full round-tripped config (which always carries the
    field) does not accidentally pin."""
    cfg = RAGConfig.from_json('{"fusion_weight_bm25": 0.8}')
    assert cfg.fusion_weight_pinned and cfg.fusion_weight_bm25 == 0.8
    rt = RAGConfig.from_json(RAGConfig().to_json())
    assert rt.fusion_weight_pinned is False


def test_config_pin_inference_ignores_machine_defaults():
    """A machine-serialized default (0.5) never pins — only a non-default
    value written in a config file does; corrupt bool weights in a
    persisted verdict are rejected (isinstance(bool, int) trap)."""
    # old-build full dump: every field present incl. the 0.5 default
    assert RAGConfig.from_json(
        '{"fusion_weight_bm25": 0.5}').fusion_weight_pinned is False
    # explicit non-default value -> pinned
    assert RAGConfig.from_json(
        '{"fusion_weight_bm25": 0.9}').fusion_weight_pinned is True
    # explicit pin of the default value
    cfg = RAGConfig.from_json(
        '{"fusion_weight_bm25": 0.5, "fusion_weight_pinned": true}')
    assert cfg.fusion_weight_pinned is True


def test_gate_band_rule_lexical_only_needs_outright_win():
    """ADVICE r3: (rrf, 1.0) zeroes the dense leg's RRF contribution, so
    it must win the band OUTRIGHT; on an in-band tie the next-most-
    lexical entry (which keeps the dense leg as tie-breaker) wins."""
    from hybrid_rag_colbertv2_tpu.retrieval.gate import (GATE_MENU,
                                                         select_entry)

    menu = GATE_MENU
    # exact tie between 0.9 and 1.0 -> 0.9 wins
    hits = {("rerank", 0.5): 0.3, ("rrf", 0.25): 0.35, ("rrf", 0.5): 0.4,
            ("rrf", 0.75): 0.5, ("rrf", 0.9): 0.7, ("rrf", 1.0): 0.7,
            ("union", 0.5): 0.4, ("union", 0.9): 0.6}
    assert select_entry(menu, hits, 64) == ("rrf", 0.9)
    # 1.0 ahead but within the one-query noise band -> still 0.9
    hits[("rrf", 1.0)] = 0.7 + 1.0 / 64
    assert select_entry(menu, hits, 64) == ("rrf", 0.9)
    # 1.0 strictly above the band -> it may ship
    hits[("rrf", 1.0)] = 0.9
    assert select_entry(menu, hits, 64) == ("rrf", 1.0)
    # parity gets NO in-band priority (it is the LEAST lexical-protective
    # entry; measured on an organic docs corpus, in-band parity cost
    # 9-20pp vs the in-band (rrf, 0.9)): a flat tie ships the most
    # protective sub-1.0 entry — at equal weight 0.9, union beats rrf
    # (the structural both-leg floor is free insurance on a tie)
    hits = {e: 0.5 for e in menu}
    assert select_entry(menu, hits, 64) == ("union", 0.9)
    # parity wins the band OUTRIGHT -> it ships
    hits = {e: 0.5 for e in menu}
    hits[("rerank", 0.5)] = 0.8
    assert select_entry(menu, hits, 64) == ("rerank", 0.5)
    # the dense-lean entry ties the band -> the more protective entry wins
    hits = {e: 0.5 for e in menu}
    hits[("rerank", 0.5)] = 0.3
    assert select_entry(menu, hits, 64) == ("union", 0.9)
    # dense-lean wins OUTRIGHT (> one-query eps above everything) -> ships
    hits[("rrf", 0.25)] = 0.6
    assert select_entry(menu, hits, 64) == ("rrf", 0.25)


def test_gate_minimax_regret_catches_regime_collapse():
    """Regression for the measured round-4 failure: a decently-trained
    dense leg made PARITY tie the aggregate mean within one query, yet
    parity collapsed on BM25-saturated whole-sentence queries (0.48 vs
    0.98). Regime-wise minimax regret must reject parity there and ship
    the entry that is never far from best on ANY regime."""
    from hybrid_rag_colbertv2_tpu.retrieval.gate import (
        GATE_MENU, select_entry_regimes)

    # numbers shaped like the measured seed-0 calibration/eval: parity
    # wins verbatim spans and synonym, but loses long-verbatim badly
    hits = {
        "verbatim": {("rerank", 0.5): 0.69, ("rrf", 0.25): 0.69,
                     ("rrf", 0.5): 0.67, ("rrf", 0.75): 0.66,
                     ("rrf", 0.9): 0.62, ("rrf", 1.0): 0.53,
                     ("union", 0.5): 0.67, ("union", 0.9): 0.62},
        "long_verbatim": {("rerank", 0.5): 0.48, ("rrf", 0.25): 0.62,
                          ("rrf", 0.5): 0.88, ("rrf", 0.75): 0.95,
                          ("rrf", 0.9): 0.97, ("rrf", 1.0): 0.98,
                          ("union", 0.5): 0.88, ("union", 0.9): 0.95},
        "dropout": {("rerank", 0.5): 0.60, ("rrf", 0.25): 0.60,
                    ("rrf", 0.5): 0.62, ("rrf", 0.75): 0.62,
                    ("rrf", 0.9): 0.60, ("rrf", 1.0): 0.55,
                    ("union", 0.5): 0.62, ("union", 0.9): 0.60},
        "synonym": {("rerank", 0.5): 0.51, ("rrf", 0.25): 0.50,
                    ("rrf", 0.5): 0.46, ("rrf", 0.75): 0.44,
                    ("rrf", 0.9): 0.36, ("rrf", 1.0): 0.30,
                    ("union", 0.5): 0.46, ("union", 0.9): 0.36},
    }
    # worst regrets: parity 0.50 (long_verbatim), 0.25: 0.36, 0.5: 0.10,
    # 0.75: 0.07, 0.9/union0.9: 0.15, 1.0: 0.21 -> 0.75 wins the band
    assert select_entry_regimes(GATE_MENU, hits, 16) == ("rrf", 0.75)
    # saturated regimes (everything ~equal): all in band, most protective
    # sub-1.0 entry ships (parity gets no priority — see band-rule test);
    # equal weight 0.9 -> the structural-floor union entry wins the tie
    flat = {r: {e: 1.0 for e in GATE_MENU} for r in hits}
    assert select_entry_regimes(GATE_MENU, flat, 16) == ("union", 0.9)
    # single-regime degenerate case must match the documented band rule
    one = {"all": hits["long_verbatim"]}
    assert select_entry_regimes(GATE_MENU, one, 64) == ("rrf", 0.9)


def test_gate_band_does_not_override_strictly_smaller_regret():
    """Regression for the measured 2026-08-18 bench-seed-1 mis-pick: the
    floor entry (rrf, 0.75) had worst regret 0.125, but (rrf, 0.9) sat at
    exactly floor + the one-query quantum (0.1875) — inside the inclusive
    band — and the old most-protective-in-band rule shipped it. The
    transfer check flagged the pick (0.719 vs the menu's best 0.875 on
    the generator-disjoint family). Protectiveness may only break EQUAL
    regrets; a strictly smaller regret must win."""
    from hybrid_rag_colbertv2_tpu.retrieval.gate import (
        GATE_MENU, select_entry_regimes)

    # the exact seed-1 calibration capture (16 queries per regime)
    hits = {
        "verbatim": {("rerank", 0.5): 0.688, ("rrf", 0.25): 0.75,
                     ("rrf", 0.5): 0.812, ("rrf", 0.75): 0.812,
                     ("rrf", 0.9): 0.812, ("rrf", 1.0): 0.812,
                     ("union", 0.5): 0.812, ("union", 0.9): 0.812},
        "long_verbatim": {("rerank", 0.5): 1.0, ("rrf", 0.25): 1.0,
                          ("rrf", 0.5): 1.0, ("rrf", 0.75): 1.0,
                          ("rrf", 0.9): 0.875, ("rrf", 1.0): 0.875,
                          ("union", 0.5): 1.0, ("union", 0.9): 0.875},
        "dropout": {("rerank", 0.5): 0.375, ("rrf", 0.25): 0.375,
                    ("rrf", 0.5): 0.438, ("rrf", 0.75): 0.625,
                    ("rrf", 0.9): 0.625, ("rrf", 1.0): 0.625,
                    ("union", 0.5): 0.438, ("union", 0.9): 0.625},
        "synonym": {("rerank", 0.5): 0.75, ("rrf", 0.25): 0.75,
                    ("rrf", 0.5): 0.812, ("rrf", 0.75): 0.688,
                    ("rrf", 0.9): 0.625, ("rrf", 1.0): 0.625,
                    ("union", 0.5): 0.812, ("union", 0.9): 0.625},
    }
    assert select_entry_regimes(GATE_MENU, hits, 16) == ("rrf", 0.75)


def test_noop_upload_keeps_gate_verdict(tmp_path):
    """ADVICE r3: an upload that adds zero new chunks leaves the index
    identical — the persisted gate verdict must survive (re-measuring
    costs ~5 cascade compiles through the tunnel)."""
    from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
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
    mode = app.resolve_final_fusion()
    gp = app._gate_path()
    saved = gp.read_text()
    # no-op upload: zero new chunks -> verdict untouched, auto not re-armed
    app.index_documents([])
    assert gp.read_text() == saved
    assert app.config.final_fusion == mode
    assert app.fusion_gate is not None
    # a REAL upload still invalidates + re-arms
    extra = write_corpus(tmp_path / "docs2", n_docs=2, seed=1)
    app.index_documents([str(p) for p in extra])
    assert app.config.final_fusion == "auto"


def test_paired_transfer_band():
    """The transfer check is a PAIRED test: an entry whose wins over the
    picked one are spread thinly across queries (high paired variance)
    stays in band, while a consistent 3-query sweep at n=24 does not;
    identical vectors always pass. Regression for the unpaired 1-SE band
    vs the post-hoc max, which rejected a fine verdict ~1/3 of the time
    (winner's curse over 6 same-mean entries)."""
    import numpy as np

    from hybrid_rag_colbertv2_tpu.retrieval.gate import paired_in_band

    n = 24
    base = np.zeros(n)
    base[: n // 2] = 1.0
    picked = ("rrf", 0.75)

    # identical outcomes -> in band regardless of entry count
    vecs = {picked: base, ("rerank", 0.5): base.copy(),
            ("rrf", 0.5): base.copy()}
    assert paired_in_band(vecs, picked)

    # one entry consistently wins 3 extra queries (mean +0.125 > 1/24,
    # paired sd small) -> out of band
    better = base.copy()
    better[n // 2: n // 2 + 3] = 1.0
    assert not paired_in_band({picked: base, ("rrf", 0.5): better}, picked)

    # same +1-query net gain but as 5 wins / 4 losses: paired variance
    # covers it -> stays in band (an unpaired band on means could not
    # tell these two cases apart)
    noisy = base.copy()
    noisy[n // 2: n // 2 + 5] = 1.0     # 5 queries flip to wins
    noisy[: 4] = 0.0                    # 4 flip to losses
    assert paired_in_band({picked: base, ("rrf", 0.5): noisy}, picked)


def test_gate_degenerate_band_parity_plus_lexical_only():
    """Band = {parity, (rrf, 1.0)} only: NEITHER may win a tie (parity
    needs an outright win; 1.0 must hold the band alone) — the gate ships
    the smallest-regret BLENDED entry instead."""
    from hybrid_rag_colbertv2_tpu.retrieval.gate import (
        GATE_MENU, select_entry_regimes)

    base = {("rerank", 0.5): 0.70, ("rrf", 0.25): 0.55, ("rrf", 0.5): 0.58,
            ("rrf", 0.75): 0.60, ("rrf", 0.9): 0.62,
            ("rrf", 1.0): 0.70 - 1.0 / 32, ("union", 0.5): 0.58,
            ("union", 0.9): 0.61}
    picked = select_entry_regimes(GATE_MENU, {"all": base}, 16)
    # blended entries are 8pp+ out of band; the best of them ships
    assert picked == ("rrf", 0.9)


def test_gate_band_width_uses_smallest_regime():
    """A regime that yielded fewer pairs than n_per has a coarser
    measurement quantum; the band must absorb a one-query flip in THAT
    regime (dict-valued n_per_regime)."""
    from hybrid_rag_colbertv2_tpu.retrieval.gate import (
        GATE_MENU, select_entry_regimes)

    # long_verbatim produced only 5 pairs -> quantum 0.2. Every blended
    # entry trails parity by exactly one query there; parity may ship
    # only by winning the band OUTRIGHT, so the band width decides.
    hits = {
        "verbatim": {e: 0.9 for e in GATE_MENU},
        "long_verbatim": {e: (1.0 if e == ("rerank", 0.5) else 0.8)
                          for e in GATE_MENU},
    }
    sizes = {"verbatim": 16, "long_verbatim": 5}
    # with the one-query band of the SMALLEST regime (1/5), the blended
    # entries stay in band -> parity has company, a blended entry ships
    # (equal regrets tie-break to the most protective sub-1.0 one; the
    # structural-floor union wins the equal-weight tie)
    assert select_entry_regimes(GATE_MENU, hits, sizes) == ("union", 0.9)
    # an int n_per of 16 (the old behavior) narrows the band to 1/16:
    # the one-query flip in the coarse regime would hand parity an
    # outright win on noise
    assert select_entry_regimes(GATE_MENU, hits, 16) == ("rerank", 0.5)


def test_gate_rule_matches_oracle_on_randomized_menus():
    """VERDICT r4 next #8: the selection rule is ONE statement — verify
    the implementation against a literal oracle of that statement on
    randomized menus. Oracle: among entries within one smallest-regime
    query of the minimum worst-regret, ship the smallest-regret entry,
    ties -> higher weight (equal weight: union beats rrf beats rerank);
    an entry that drops a leg (rerank mode, or ("rrf", 1.0) — never
    union) may ship only when it is alone in the band; a band of only
    leg-droppers falls back to the smallest-regret full-hybrid entry of
    the whole menu."""
    from hybrid_rag_colbertv2_tpu.retrieval.gate import (
        GATE_MENU, _drops_leg, select_entry_regimes)

    def oracle(menu, hits_by_regime, n_min):
        regret = {e: 0.0 for e in menu}
        for hits in hits_by_regime.values():
            best = max(hits[e] for e in menu)
            for e in menu:
                regret[e] = max(regret[e], best - hits[e])
        eps = 1.0 / n_min + 1e-9
        floor = min(regret.values())
        band = [e for e in menu if regret[e] <= floor + eps]
        if len(band) == 1:
            return band[0]
        pool = [e for e in band if not _drops_leg(e)]
        if not pool:
            pool = [e for e in menu if not _drops_leg(e)] or list(menu)
        best = min(regret[e] for e in pool)
        rank = {"rerank": 0, "rrf": 1, "union": 2}
        return max((e for e in pool if regret[e] <= best + 1e-12),
                   key=lambda e: (e[1], rank[e[0]]))

    rng = np.random.default_rng(0)
    regime_names = ["a", "b", "c", "d", "e"]
    for trial in range(500):
        n_regimes = int(rng.integers(1, 6))
        n_min = int(rng.integers(4, 33))
        # quantized hit rates (multiples of 1/n) like real measurements
        hits = {r: {e: round(float(rng.integers(0, n_min + 1)) / n_min, 6)
                    for e in GATE_MENU}
                for r in regime_names[:n_regimes]}
        got = select_entry_regimes(GATE_MENU, hits, n_min)
        want = oracle(GATE_MENU, hits, n_min)
        assert got == want, (trial, hits, got, want)
        assert got in GATE_MENU
        # invariant: a leg-dropping winner must have won outright
        if _drops_leg(got):
            regret = {e: 0.0 for e in GATE_MENU}
            for h in hits.values():
                best = max(h.values())
                for e in GATE_MENU:
                    regret[e] = max(regret[e], best - h[e])
            floor = min(regret.values())
            band = [e for e in GATE_MENU
                    if regret[e] <= floor + 1.0 / n_min + 1e-9]
            assert band == [got]


def test_reworded_query_pairs_shape():
    """The compositional-rewording generator: queries are stopword-free
    shuffled bags of source-chunk words with rare anchors kept, and
    mine_text is a verbatim substring of the source (hard-negative
    mining and the duplicate-positive filter depend on that)."""
    from hybrid_rag_colbertv2_tpu.index.textproc import ENGLISH_STOPWORDS
    from hybrid_rag_colbertv2_tpu.tools.sample_corpus import generate_corpus
    from hybrid_rag_colbertv2_tpu.train.data import (corpus_word_df,
                                                     reworded_query_pairs)

    docs = generate_corpus(n_docs=8, seed=0)
    chunks = [line for d in docs for line in d.splitlines()
              if line and not line.startswith("#")]
    pairs = reworded_query_pairs(chunks, n_pairs_per_doc=2, seed=1,
                                 with_mine_text=True)
    assert len(pairs) >= len(chunks)      # long chunks all participate
    df = corpus_word_df(chunks)
    n_shuffled = 0
    for q, idx, mine in pairs:
        src_words = set(chunks[idx].split())
        q_words = q.split()
        assert len(q_words) >= 4
        # every query word comes from the source chunk (no substitution
        # was requested)
        assert all(w in src_words for w in q_words)
        # stopwords are gone
        assert not any(w.lower().strip(".,") in ENGLISH_STOPWORDS
                       for w in q_words)
        # mine_text is a verbatim substring
        assert mine in chunks[idx]
        if q not in chunks[idx]:
            n_shuffled += 1
    # the family is genuinely non-verbatim (shuffle + dropout)
    assert n_shuffled >= 0.9 * len(pairs)
    # rarity-aware dropout: unique words survive at a higher rate than
    # corpus-common ones, aggregated over the family
    kept = {True: [0, 0], False: [0, 0]}   # rare? -> [kept, total]
    qset = {}
    for q, idx, _ in pairs:
        qset.setdefault(idx, set()).update(q.split())
    for idx, texts in qset.items():
        for w in set(chunks[idx].split()):
            key = w.lower().strip(".,")
            if not key or key in ENGLISH_STOPWORDS:
                continue
            rare = df.get(key, 1) <= 2
            kept[rare][1] += 1
            kept[rare][0] += int(w in texts)
    rare_rate = kept[True][0] / max(kept[True][1], 1)
    common_rate = kept[False][0] / max(kept[False][1], 1)
    assert rare_rate > common_rate


def test_question_query_pairs_shape():
    """The interrogative-framed generator: every query is a reworded
    bag-of-content-words wrapped in question scaffolding (frame head,
    trailing '?'), the content words still come from the source chunk,
    and mine_text stays a verbatim substring (frame words carry no
    lexical anchor, so mining must run on the span)."""
    from hybrid_rag_colbertv2_tpu.tools.sample_corpus import generate_corpus
    from hybrid_rag_colbertv2_tpu.train.data import (_QUESTION_HEADS,
                                                     question_query_pairs)

    docs = generate_corpus(n_docs=8, seed=0)
    chunks = [line for d in docs for line in d.splitlines()
              if line and not line.startswith("#")]
    pairs = question_query_pairs(chunks, n_pairs_per_doc=2, seed=1,
                                 with_mine_text=True)
    assert len(pairs) >= len(chunks)
    heads_seen = set()
    for q, idx, mine in pairs:
        assert q.endswith("?")
        head = next(h for h in sorted(_QUESTION_HEADS, key=len,
                                      reverse=True) if q.startswith(h))
        heads_seen.add(head)
        # strip frame, optional tail, and '?': the content words all
        # come from the source chunk
        body = q[len(head):].rstrip("?").strip()
        src_words = set(chunks[idx].split())
        content = [w for w in body.split() if w in src_words]
        assert len(content) >= 4
        assert mine in chunks[idx]
    # the frame is sampled, not constant
    assert len(heads_seen) >= 4


def test_question_pairs_in_auto_train_recipe():
    """encoder_question_pairs > 0 adds the family to the auto-train
    recipe (application._train_encoder) — verified through the pair
    builder the app calls, not by retraining."""
    from hybrid_rag_colbertv2_tpu.train.data import question_query_pairs

    chunks = [f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i} "
              f"eta{i} theta{i} iota{i} kappa{i}" for i in range(20)]
    pairs = question_query_pairs(chunks, n_pairs_per_doc=2, seed=3,
                                 synonym_prob=0.15, with_mine_text=True)
    assert pairs and all(len(p) == 3 for p in pairs)
    cfg = RAGConfig()
    assert cfg.encoder_question_pairs == 0     # off until measured
    cfg.encoder_question_pairs = 4
    cfg.validate()


def test_gate_tiny_corpus_fallback_respects_checkpoint():
    """Below MIN_GATE_CHUNKS the unmeasurable default is lexical-lean RRF
    for a corpus-trained leg but reference PARITY when a pretrained
    checkpoint is configured (its semantics don't depend on corpus
    size)."""
    from hybrid_rag_colbertv2_tpu.retrieval.gate import resolve_final_fusion

    corpus = ["alpha beta", "gamma delta"]          # < MIN_GATE_CHUNKS
    cfg = RAGConfig()
    picked, details = resolve_final_fusion(cfg, None, None, corpus)
    assert picked == ("rrf", 0.9)

    cfg2 = RAGConfig(encoder_checkpoint="/some/ckpt")
    picked2, details2 = resolve_final_fusion(cfg2, None, None, corpus)
    assert picked2 == ("rerank", 0.5)
    assert "checkpoint" in details2["reason"]

    # pinned weight wins over the checkpoint default either way
    picked3, _ = resolve_final_fusion(cfg2, None, None, corpus,
                                      fixed_weight=0.75)
    assert picked3 == ("rrf", 0.75)
