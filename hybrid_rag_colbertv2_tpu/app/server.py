"""HTTP serving layer — stdlib-only JSON API over the retriever/chatbot.

New capability vs the reference (whose only interface is a terminal REPL,
local_rag_complete.py:1189-1227). Endpoints:

  GET  /health            -> {"status": "ok", "ollama": bool}
  GET  /stats             -> chunk/document/image counts + devices
  POST /query             {"query": str, "top_k"?: int} -> ranked sources
  POST /chat              {"query": str, "generate"?: bool} -> response +
                          sources + per-stage timings

Design: queries are funneled through a single lock — retrieval itself is a
sub-millisecond on-device call, so a lock (not a batching queue) is the
right complexity point for this tier; concurrent clients are still served
by the threading server for IO. Batched serving rides ``retrieve_batch``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from ..utils.logging import get_logger

log = get_logger(__name__)


def make_handler(app):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through our logger
            log.debug("%s " + fmt, self.address_string(), *args)

        # ------------------------------------------------------------
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_json(self) -> Optional[dict]:
            try:
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n) or b"{}")
            except Exception:
                return None

        # ------------------------------------------------------------
        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok",
                                 "ollama": app.check_ollama()})
            elif self.path == "/stats":
                self._send(200, app.stats())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            req = self._read_json()
            if req is None or "query" not in req:
                self._send(400, {"error": "body must be JSON with 'query'"})
                return
            if not isinstance(req["query"], str) or not req["query"].strip():
                self._send(400, {"error": "'query' must be a non-empty string"})
                return
            try:
                if self.path == "/query":
                    with lock:
                        rows = app.query(req["query"], req.get("top_k"))
                    self._send(200, {"results": rows})
                elif self.path == "/chat":
                    gen = bool(req.get("generate", True))
                    with lock:
                        out = app.chat(req["query"], generate=gen)
                    self._send(200, out)
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})
            except Exception as e:
                log.exception("request failed")
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(app, host: str = "127.0.0.1", port: int = 8080) -> None:
    """Blocking server loop. ``app`` must have initialize_chatbot() done."""
    httpd = ThreadingHTTPServer((host, port), make_handler(app))
    log.info("serving on http://%s:%d (endpoints: /health /stats /query /chat)",
             host, port)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
