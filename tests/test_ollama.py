"""OllamaClient against a mock HTTP sidecar (no real Ollama needed).

Covers the reference client's behavioral contract
(local_rag_complete.py:132-233): /api/generate payload shape, LLaVA
TYPE/DESCRIPTION/TEXT parsing, chat prompt flattening with context-stuffed
system message, liveness probe, and the retry-then-raise failure mode this
build adds (the reference print-and-returns "")."""

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from hybrid_rag_colbertv2_tpu.app.ollama import OllamaClient
from hybrid_rag_colbertv2_tpu.config import RAGConfig


class _Handler(BaseHTTPRequestHandler):
    requests_seen = []
    response_text = "hello from mock"
    fail_times = 0        # respond 500 this many times, then succeed

    def log_message(self, *a):
        pass

    def do_GET(self):
        if self.path == "/api/tags":
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b'{"models": []}')
        else:
            self.send_response(404)
            self.end_headers()

    def do_POST(self):
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"])))
        _Handler.requests_seen.append((self.path, body))
        if _Handler.fail_times > 0:
            _Handler.fail_times -= 1
            self.send_response(500)
            self.end_headers()
            return
        self.send_response(200)
        self.end_headers()
        self.wfile.write(json.dumps(
            {"response": _Handler.response_text}).encode())


@pytest.fixture()
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _Handler.requests_seen = []
    _Handler.fail_times = 0
    _Handler.response_text = "hello from mock"
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.fixture()
def client(server):
    return OllamaClient(RAGConfig(ollama_url=server, ollama_timeout_s=5),
                        retries=1)


def test_is_alive(client):
    assert client.is_alive()


def test_is_alive_false_when_down():
    c = OllamaClient(RAGConfig(ollama_url="http://127.0.0.1:1",
                               ollama_timeout_s=1))
    assert not c.is_alive()


def test_generate_payload_shape(client):
    out = client.generate("llama3.2:3b", "What is a TPU?", system="be brief")
    assert out == "hello from mock"
    path, body = _Handler.requests_seen[-1]
    assert path == "/api/generate"
    # reference payload shape (local_rag_complete.py:147-158)
    assert body["model"] == "llama3.2:3b"
    assert body["prompt"] == "What is a TPU?"
    assert body["system"] == "be brief"
    assert body["stream"] is False


def test_generate_retries_then_succeeds(client):
    _Handler.fail_times = 1
    assert client.generate("m", "p") == "hello from mock"


def test_generate_raises_after_retries(client):
    _Handler.fail_times = 5
    with pytest.raises(RuntimeError, match="Ollama generation failed"):
        client.generate("m", "p")


def test_analyze_image_parses_structured_response(client, tmp_path):
    img = tmp_path / "fig.png"
    img.write_bytes(b"\x89PNG fake image bytes")
    _Handler.response_text = (
        "TYPE: diagram\n"
        "DESCRIPTION: A block diagram of a systolic array.\n"
        "TEXT: MXU 128x128")
    result = client.analyze_image(str(img))
    # parse parity with local_rag_complete.py:194-208
    assert result == {
        "type": "diagram",
        "description": "A block diagram of a systolic array.",
        "ocr_text": "MXU 128x128",
    }
    _, body = _Handler.requests_seen[-1]
    assert body["images"] == [
        base64.b64encode(b"\x89PNG fake image bytes").decode()]
    assert "TYPE:" in body["prompt"]


def test_analyze_image_defaults_on_freeform_response(client, tmp_path):
    img = tmp_path / "fig.png"
    img.write_bytes(b"x")
    _Handler.response_text = "this model ignored the format"
    result = client.analyze_image(str(img))
    assert result["type"] == "unknown"
    assert result["description"] == ""


def test_chat_flattens_history_and_stuffs_context(client):
    client.chat(
        [{"role": "user", "content": "hi"},
         {"role": "assistant", "content": "hello"},
         {"role": "user", "content": "what is RRF?"}],
        context="[Source 1] RRF combines rankings.",
    )
    _, body = _Handler.requests_seen[-1]
    # role-prefixed flattened history (local_rag_complete.py:222-227)
    assert body["prompt"] == (
        "user: hi\nassistant: hello\nuser: what is RRF?")
    assert "Context from documents:" in body["system"]
    assert "[Source 1] RRF combines rankings." in body["system"]


def test_chat_without_context_plain_system(client):
    client.chat([{"role": "user", "content": "hi"}])
    _, body = _Handler.requests_seen[-1]
    assert body["system"] == "You are a helpful AI assistant."
