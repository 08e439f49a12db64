"""HTTP serving layer: real socket round trips against a live server."""

import json
import threading
import urllib.request
import urllib.error
from http.server import ThreadingHTTPServer

import pytest

from hybrid_rag_colbertv2_tpu.app.application import RAGApplication
from hybrid_rag_colbertv2_tpu.app.server import make_handler
from hybrid_rag_colbertv2_tpu.config import RAGConfig


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("srv")
    (root / "doc.md").write_text(
        "# TPU\n\nsystolic array multiplies matrices fast\n\n"
        "# Pasta\n\nboil noodles in salted water\n")
    cfg = RAGConfig(
        db_path=str(root / "s.db"),
        bm25_index_path=str(root / "idx/bm25"),
        colbert_index_path=str(root / "idx/colbert"),
        images_dir=str(root / "imgs"),
        tokenizer_path=str(root / "idx/tok.json"),
        min_chunk_size=4, max_chunk_size=64,
        encoder_preset="tiny", tokenizer_vocab_size=256,
    )
    app = RAGApplication(cfg, use_ollama=False)
    app.index_documents([str(root / "doc.md")])
    app.initialize_chatbot(use_mesh=False)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_stats(server):
    code, body = _get(server + "/health")
    assert code == 200 and body["status"] == "ok"
    code, body = _get(server + "/stats")
    assert code == 200 and body["chunks"] >= 1


def test_query_endpoint(server):
    code, body = _post(server + "/query",
                       {"query": "systolic array", "top_k": 2})
    assert code == 200
    rows = body["results"]
    assert rows and rows[0]["rank"] == 1
    assert any("systolic" in r["text"] for r in rows)


def test_chat_endpoint_no_llm(server):
    code, body = _post(server + "/chat",
                       {"query": "what boils?", "generate": False})
    assert code == 200
    assert body["response"] == ""
    assert body["sources"]


def test_bad_requests(server):
    code, body = _post(server + "/query", {"nope": 1})
    assert code == 400
    code, body = _post(server + "/query", {"query": "   "})
    assert code == 400
    code, body = _post(server + "/elsewhere", {"query": "x"})
    assert code == 404
    code, body = _get(server + "/nothing")
    assert code == 404
