"""End-to-end application test: upload -> index -> (reload) -> query ->
chat -> stats, all without an LLM sidecar (SURVEY.md section 4(d))."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
from hybrid_rag_colbertv2_tpu.app.chatbot import RAGChatbot
from hybrid_rag_colbertv2_tpu.config import RAGConfig

DOC1 = """# TPU Architecture

The MXU is a 128x128 systolic array that performs matrix multiplication.
Data flows from HBM through VMEM to the compute units.

## Memory Hierarchy

HBM provides gigabytes of capacity while VMEM is a 16 megabyte on-chip
buffer that feeds the compute units with low latency access patterns.

# Retrieval Systems

BM25 ranks documents with lexical term weights. ColBERT uses late
interaction over token embeddings for semantic matching quality.
"""

DOC2 = """# Cooking Pasta

Boil water with salt. Add the pasta and stir occasionally until al dente.

## Sauces

Tomato sauce pairs with long noodles while cream sauce suits short shapes.
"""


@pytest.fixture(scope="module")
def app(tmp_path_factory):
    root = tmp_path_factory.mktemp("app")
    d1 = root / "tpu.md"
    d1.write_text(DOC1)
    d2 = root / "pasta.md"
    d2.write_text(DOC2)
    cfg = RAGConfig(
        db_path=str(root / "rag.db"),
        bm25_index_path=str(root / "idx/bm25"),
        colbert_index_path=str(root / "idx/colbert"),
        images_dir=str(root / "imgs"),
        tokenizer_path=str(root / "idx/tokenizer.json"),
        min_chunk_size=16, max_chunk_size=128,
        encoder_preset="tiny", tokenizer_vocab_size=512,
    )
    a = RAGApplication(cfg, use_ollama=False)
    r = a.index_documents([str(d1), str(d2)])
    assert r["total_chunks"] >= 3
    return a, cfg, root


def test_upload_then_query(app):
    a, cfg, root = app
    a.initialize_chatbot()
    results = a.query("systolic array matrix multiplication", top_k=5)
    assert results
    assert all({"chunk_id", "text", "score", "rank"} <= set(r)
               for r in results)
    # with BM25 in the cascade and a tiny corpus, the MXU chunk must be
    # among the retrieved set
    assert any("MXU" in r["text"] for r in results)


def test_incremental_upload_rebuilds_full_corpus(app, tmp_path):
    a, cfg, root = app
    d3 = tmp_path / "extra.md"
    d3.write_text("# Quantum\n\nQubits hold superpositions of states.\n")
    r = a.index_documents([str(d3)])
    # the updated index covers ALL docs (incrementally appended), not just
    # the new one (the reference loses old docs unless re-uploaded)
    assert r["total_chunks"] == a.store.stats()["chunks"]
    a.initialize_chatbot()
    res = a.query("qubits superposition")
    assert any("Qubits" in x["text"] for x in res)


def test_reload_in_fresh_app(app):
    a, cfg, root = app
    b = RAGApplication(cfg, use_ollama=False)
    b.initialize_chatbot()
    res = b.query("boiling pasta al dente")
    assert any("pasta" in r["text"].lower() for r in res)


def test_chat_without_llm(app):
    a, cfg, root = app
    a.initialize_chatbot()
    out = a.chat("how does the MXU multiply matrices?", generate=False)
    assert out["response"] == ""
    assert out["retrieved_chunks"] >= 1
    assert out["sources"][0]["source_id"] == 1
    assert "[Source 1" in out["context"]
    # history accumulates
    a.chat("and what about memory?", generate=False)
    assert len(a.chatbot.conversation_history) == 4
    a.chatbot.clear_history()
    assert a.chatbot.conversation_history == []


def test_stats(app):
    a, cfg, root = app
    s = a.stats()
    assert s["documents"] >= 2 and s["chunks"] >= 3
    assert s["indexes_built"] is True


def test_per_query_timings_surface(app):
    """retrieve() records a per-call stage split (VERDICT r4 missing #3:
    the reference prints BM25/dense/fusion/fetch wall-clock per query,
    local_rag_complete.py:901-933); stats() surfaces the latest one."""
    a, cfg, root = app
    a.initialize_chatbot()
    a.query("systolic array matrix multiplication", top_k=5)
    lt = dict(a.retriever.last_timings)
    # flat retriever: tokenize / encode+cascade / fetch; sharded (the
    # fixture auto-shards on the virtual mesh): tokenize / cascade
    assert "tokenize" in lt
    dispatch = "encode+cascade" if "encode+cascade" in lt else "cascade"
    assert dispatch in lt
    assert all(v > 0 for v in lt.values())
    assert a.stats()["last_query_timings"] == lt
    # the split is per-CALL, not cumulative: a second query's timings
    # must not include the first's
    a.query("boiling pasta al dente", top_k=5)
    timer = getattr(a.retriever, "_r", a.retriever).timer
    assert a.retriever.last_timings[dispatch] < timer.timings[dispatch]


def test_context_format_parity():
    chunks = [{
        "chunk_id": 7, "text": "body text", "heading_path": "A > B",
        "has_images": True, "score": 1.5,
        "metadata": {"image_paths": ["x.png", "y.png"]},
    }]
    ctx = RAGChatbot._build_context(chunks)
    assert ctx.startswith("[Source 1 (A > B) [Contains 2 image(s)]]\nbody text")
    src = RAGChatbot._format_sources(chunks)[0]
    assert src["source_id"] == 1 and src["chunk_id"] == 7
    assert src["preview"].startswith("body text")


def test_cli_surface(app):
    a, cfg, root = app
    cfg_path = root / "config.json"
    cfg.save(cfg_path)
    env_script = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; from hybrid_rag_colbertv2_tpu.app.cli import main;"
        "sys.exit(main(sys.argv[1:]))"
    )
    out = subprocess.run(
        [sys.executable, "-c", env_script, "--config", str(cfg_path),
         "--stats", "--json", "--no-generate"],
        capture_output=True, text=True, cwd=str(Path(__file__).parent.parent),
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["chunks"] >= 3

    out = subprocess.run(
        [sys.executable, "-c", env_script, "--config", str(cfg_path),
         "--query", "systolic array", "--json", "--no-generate"],
        capture_output=True, text=True, cwd=str(Path(__file__).parent.parent),
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    rows = json.loads(out.stdout.strip().splitlines()[-1])
    assert rows and rows[0]["rank"] == 1


def test_trained_indexing_improves_ranking(tmp_path):
    """--train-encoder path: with corpus-trained weights the semantically
    matching chunk must rank first end-to-end."""
    docs = {
        "astro.md": "# Astronomy\n\ntelescope galaxy nebula star planet "
                    "orbit cosmos " * 6,
        "cook.md": "# Cooking\n\nrecipe sauce boil saute pan flavor "
                   "ingredient spice " * 6,
        "chips.md": "# Hardware\n\nsystolic array matrix multiply MXU VMEM "
                    "bandwidth chip " * 6,
    }
    for name, text in docs.items():
        (tmp_path / name).write_text(text)
    cfg = RAGConfig(
        db_path=str(tmp_path / "t.db"),
        bm25_index_path=str(tmp_path / "idx/bm25"),
        colbert_index_path=str(tmp_path / "idx/colbert"),
        images_dir=str(tmp_path / "imgs"),
        tokenizer_path=str(tmp_path / "idx/tok.json"),
        min_chunk_size=8, max_chunk_size=256,
        encoder_preset="tiny", tokenizer_vocab_size=512,
        encoder_train_steps=120,
    )
    a = RAGApplication(cfg, use_ollama=False)
    a.index_documents([str(tmp_path / n) for n in docs])
    a.initialize_chatbot()
    for query, key in [("telescope galaxy star", "telescope"),
                       ("recipe sauce flavor", "recipe"),
                       ("systolic array MXU", "systolic")]:
        top = a.query(query, top_k=1)[0]
        assert key in top["text"].lower(), (query, top["text"][:60])
    # fresh app must load the TRAINED weights, not re-randomize
    b = RAGApplication(cfg, use_ollama=False)
    b.initialize_chatbot()
    top = b.query("telescope galaxy star", top_k=1)[0]
    assert "telescope" in top["text"].lower()


def test_bucketed_layout_end_to_end(tmp_path):
    cfg = RAGConfig(
        db_path=str(tmp_path / "b.db"),
        bm25_index_path=str(tmp_path / "idx/bm25"),
        colbert_index_path=str(tmp_path / "idx/colbert"),
        images_dir=str(tmp_path / "imgs"),
        tokenizer_path=str(tmp_path / "idx/tok.json"),
        min_chunk_size=8, max_chunk_size=64,
        encoder_preset="tiny", tokenizer_vocab_size=512,
    )
    cfg.mesh.index_layout = "bucketed"
    cfg.mesh.doc_token_buckets = (32, 64)
    d = tmp_path / "mix.md"
    d.write_text("# Short\n\ntiny section\n\n# Long\n\n" + "word " * 120)
    a = RAGApplication(cfg, use_ollama=False)
    a.index_documents([str(d)])
    a.initialize_chatbot(use_mesh=False)
    res = a.query("tiny section", top_k=2)
    assert res and res[0]["rank"] == 1
    # reload detects the bucketed layout from disk
    b = RAGApplication(cfg, use_ollama=False)
    b.initialize_chatbot(use_mesh=False)
    res2 = b.query("tiny section", top_k=2)
    assert [r["chunk_id"] for r in res2] == [r["chunk_id"] for r in res]


def test_bucketed_incremental_upload(tmp_path):
    """Second upload with the bucketed layout must APPEND (encode only the
    new chunks) and serve the new document — previously bucketed fell
    back to a full rebuild."""
    from hybrid_rag_colbertv2_tpu.index.bucketed import BucketedDenseIndex

    cfg = RAGConfig(
        db_path=str(tmp_path / "b.db"),
        bm25_index_path=str(tmp_path / "idx/bm25"),
        colbert_index_path=str(tmp_path / "idx/colbert"),
        images_dir=str(tmp_path / "imgs"),
        tokenizer_path=str(tmp_path / "idx/tok.json"),
        min_chunk_size=8, max_chunk_size=64,
        encoder_preset="tiny", tokenizer_vocab_size=512,
    )
    cfg.mesh.index_layout = "bucketed"
    cfg.mesh.doc_token_buckets = (32, 64)
    d1 = tmp_path / "first.md"
    d1.write_text("# Short\n\ntiny section about espresso\n")
    a = RAGApplication(cfg, use_ollama=False)
    a.index_documents([str(d1)])
    n1 = a.indexes.dense.n_docs
    d2 = tmp_path / "second.md"
    d2.write_text("# Long\n\nsystolic arrays multiply matrices "
                  + "word " * 80)
    a.index_documents([str(d2)])
    assert isinstance(a.indexes.dense, BucketedDenseIndex)
    assert a.indexes.dense.n_docs > n1
    # only the NEW chunks were encoded (append stage ran)
    assert "colbert_append" in a.indexes.timer.timings
    a.initialize_chatbot(use_mesh=False)
    res = a.query("systolic arrays", top_k=2)
    assert res and "systolic" in res[0]["text"]
    # the pre-append chunk remains retrievable (rank on a 3-chunk corpus
    # with an untrained tiny encoder is parity-rerank noise — membership
    # is the indexing contract)
    res_old = a.query("tiny section about espresso", top_k=3)
    assert any("espresso" in r["text"] for r in res_old)


def test_query_sees_newly_indexed_docs_without_reinit(tmp_path):
    """Regression: a live retriever must not keep serving the previous
    index after index_documents (staleness bug found via examples/demo.py)."""
    (tmp_path / "a.md").write_text("# A\n\nsystolic arrays multiply\n")
    cfg = RAGConfig(
        db_path=str(tmp_path / "s.db"),
        bm25_index_path=str(tmp_path / "i/b"),
        colbert_index_path=str(tmp_path / "i/c"),
        images_dir=str(tmp_path / "im"),
        tokenizer_path=str(tmp_path / "i/t.json"),
        min_chunk_size=2, max_chunk_size=64,
        encoder_preset="tiny", tokenizer_vocab_size=256,
    )
    app = RAGApplication(cfg, use_ollama=False)
    app.index_documents([str(tmp_path / "a.md")])
    assert len(app.query("systolic", 5)) >= 1      # binds a retriever

    (tmp_path / "b.md").write_text("# B\n\nquantum flux capacitors hum\n")
    app.index_documents([str(tmp_path / "b.md")])
    rows = app.query("quantum flux capacitors", 5)
    assert any("quantum" in r.get("text", "") for r in rows), rows


def test_chat_survives_reindexing(tmp_path):
    """Regression (self-review): re-indexing must rebind, not break, an
    initialized chat session — and keep its history."""
    (tmp_path / "a.md").write_text("# A\n\nsystolic arrays multiply\n")
    cfg = RAGConfig(
        db_path=str(tmp_path / "s.db"),
        bm25_index_path=str(tmp_path / "i/b"),
        colbert_index_path=str(tmp_path / "i/c"),
        images_dir=str(tmp_path / "im"),
        tokenizer_path=str(tmp_path / "i/t.json"),
        min_chunk_size=2, max_chunk_size=64,
        encoder_preset="tiny", tokenizer_vocab_size=256,
    )
    app = RAGApplication(cfg, use_ollama=False)
    app.index_documents([str(tmp_path / "a.md")])
    app.initialize_chatbot(use_mesh=False)
    out1 = app.chat("systolic arrays", generate=False)
    assert out1["sources"]
    n_hist = len(app.chatbot.conversation_history)

    (tmp_path / "b.md").write_text("# B\n\nquantum flux capacitors\n")
    app.index_documents([str(tmp_path / "b.md")])
    out2 = app.chat("quantum flux capacitors", generate=False)  # no re-init
    assert any("quantum" in s.get("preview", "") for s in out2["sources"])
    assert len(app.chatbot.conversation_history) > n_hist  # history kept


def test_eval_recall_tool(tmp_path, capsys):
    import json as _json
    from hybrid_rag_colbertv2_tpu.tools.eval_recall import main as eval_main

    (tmp_path / "d.md").write_text(
        "# T\n\n" + "\n\n".join(
            f"## S{i}\n\nunique topic{i} words alpha{i} beta{i} gamma{i} "
            f"delta{i} epsilon{i} zeta{i}" for i in range(12)))
    cfg = RAGConfig(
        db_path=str(tmp_path / "s.db"),
        bm25_index_path=str(tmp_path / "i/b"),
        colbert_index_path=str(tmp_path / "i/c"),
        images_dir=str(tmp_path / "im"),
        tokenizer_path=str(tmp_path / "i/t.json"),
        min_chunk_size=2, max_chunk_size=32,
        encoder_preset="tiny", tokenizer_vocab_size=256,
        dense_prefilter=16,
    )
    cfg.save(tmp_path / "cfg.json")
    app = RAGApplication(cfg, use_ollama=False)
    app.index_documents([str(tmp_path / "d.md")])

    rc = eval_main(["--config", str(tmp_path / "cfg.json"),
                    "--n-queries", "8", "--k", "3", "--batch", "4"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["queries"] == 8 and out["k"] == 3
    # BM25 alone nails unique-vocabulary pseudo-queries
    assert out["hit@3_exact"] >= 0.5
    assert 0.0 <= out["agreement@3"] <= 1.0


def test_nondivisible_mesh_falls_back_to_single_device(app):
    """A mesh whose data axis does not divide the index padding (e.g. 6
    devices vs n_pad=128) must serve single-device with a warning, not
    crash in the sharders (code-review r2 finding)."""
    import dataclasses

    from hybrid_rag_colbertv2_tpu.retrieval.cascade import HybridRetriever

    a, cfg, root = app
    cfg6 = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, mesh_shape=(6, 1)))
    a2 = RAGApplication(cfg6, use_ollama=False)
    a2.initialize_chatbot(use_mesh=True)
    assert isinstance(a2.retriever, HybridRetriever)   # fell back
    res = a2.query("systolic array matrix multiplication", top_k=3)
    assert res and any("MXU" in r["text"] for r in res)


def test_chat_history_not_corrupted_by_generation_failure(app):
    """A raising generate must not leave orphan user turns in the history
    (each retry would stack another, corrupting later prompts)."""
    from hybrid_rag_colbertv2_tpu.app.chatbot import RAGChatbot

    a, cfg, root = app
    a.initialize_chatbot(use_mesh=False)

    class _Boom:
        def chat(self, messages, context):
            raise RuntimeError("model not pulled")

    bot = RAGChatbot(cfg, a.retriever, _Boom())
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        bot.chat("first question", generate=True)
    assert bot.conversation_history == []
    # a later successful (generate=False) turn commits both messages
    out = bot.chat("second question", generate=False)
    assert [m["role"] for m in bot.conversation_history] == [
        "user", "assistant"]
    assert out["retrieved_chunks"] >= 0


def test_fresh_app_auto_train_hybrid_not_below_bm25(tmp_path):
    """VERDICT r3 next #4: out-of-the-box (default config: auto-train +
    auto gate), a fresh --upload -> --query app must (a) actually train
    the dense leg once, (b) reuse it on incremental uploads, and (c)
    ship a gated hybrid that does not lose to its own BM25 leg on
    held-out queries."""
    import numpy as np

    from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
    from hybrid_rag_colbertv2_tpu.tools.sample_corpus import write_corpus
    from hybrid_rag_colbertv2_tpu.train.data import pseudo_query_pairs

    paths = write_corpus(tmp_path / "docs", n_docs=6, seed=0)
    cfg = RAGConfig(
        db_path=str(tmp_path / "rag.db"),
        bm25_index_path=str(tmp_path / "idx/bm25"),
        colbert_index_path=str(tmp_path / "idx/colbert"),
        tokenizer_path=str(tmp_path / "idx/tok.json"),
        images_dir=str(tmp_path / "img"),
        min_chunk_size=48, max_chunk_size=96, doc_max_tokens=96,
        encoder_preset="tiny", tokenizer_vocab_size=512,
        # encoder_train_steps NOT set -> -1 AUTO is the default
    )
    assert cfg.encoder_train_steps == -1
    app = RAGApplication(cfg, use_ollama=False)
    app.index_documents([str(p) for p in paths])
    marker = app._trained_marker_path()
    assert marker.exists(), "auto mode must train a fresh index"
    # incremental upload must NOT retrain (marker gates auto mode)
    mtime = marker.stat().st_mtime_ns
    extra = write_corpus(tmp_path / "docs2", n_docs=1, seed=5)
    app.index_documents([str(p) for p in extra])
    assert marker.stat().st_mtime_ns == mtime

    app.initialize_chatbot(use_mesh=False)
    assert app.config.final_fusion in ("rerank", "rrf", "union")
    corpus = app.store.all_chunk_texts()
    # held-out queries (seed disjoint from training=0 and gate=+7919)
    pairs = pseudo_query_pairs(corpus, n_pairs_per_doc=1, seed=424242,
                               word_dropout=0.2)[:24]
    queries = [q for q, _ in pairs]
    sources = np.array([i for _, i in pairs])
    ids, _ = app.retriever.retrieve_batch(queries, 10)
    hyb = np.mean([s in set(row.tolist())
                   for row, s in zip(ids, sources)])
    lex = app.indexes.lexical
    bm = np.mean([
        s in set(np.argsort(-lex.score_host(q))[:10].tolist())
        for q, s in zip(queries, sources)])
    # one-query slack: the gate guarantees >= max(leg) up to noise
    assert hyb >= bm - 1.0 / len(queries) - 1e-9, (hyb, bm)


def test_convert_index_dtype_without_reencoding(tmp_path):
    """--convert-index: requantize the persisted dense index (int8 ->
    int4-doc) without re-encoding; queries still rank the right corpus,
    the persisted meta records the new layout, and the measured gate
    verdict is dropped so 'auto' re-measures on the new grid."""
    d1 = tmp_path / "tpu.md"
    d1.write_text(DOC1)
    cfg = RAGConfig(
        db_path=str(tmp_path / "rag.db"),
        bm25_index_path=str(tmp_path / "idx/bm25"),
        colbert_index_path=str(tmp_path / "idx/colbert"),
        images_dir=str(tmp_path / "imgs"),
        tokenizer_path=str(tmp_path / "idx/tokenizer.json"),
        min_chunk_size=16, max_chunk_size=128,
        encoder_preset="tiny", tokenizer_vocab_size=512,
    )
    a = RAGApplication(cfg, use_ollama=False)
    a.index_documents([str(d1)])
    a.initialize_chatbot()
    before = a.query("systolic array matrix multiplication", top_k=3)
    gate_file = Path(cfg.colbert_index_path) / "fusion_gate.json"
    gate_file.write_text("{}")          # simulate a persisted verdict

    r = a.convert_index("int4-doc")
    assert r["from"] == "int8" and r["to"] == "int4-doc"
    # the stale verdict was dropped; the rebind re-measured on the NEW
    # layout and persisted a fresh one (or none, if nothing to rebind)
    assert not gate_file.exists() or gate_file.read_text() != "{}"
    meta = json.loads(
        (Path(cfg.colbert_index_path) / "meta.json").read_text())
    assert meta["dtype"] == "int4-doc"

    # the live retriever was rebound to the converted index
    after = a.query("systolic array matrix multiplication", top_k=3)
    assert after[0]["chunk_id"] == before[0]["chunk_id"]

    # a FRESH process loads the converted layout
    b = RAGApplication(cfg, use_ollama=False)
    b.initialize_chatbot()
    assert b.indexes.dense.quant == "int4-doc"
    again = b.query("systolic array matrix multiplication", top_k=3)
    assert again[0]["chunk_id"] == before[0]["chunk_id"]
