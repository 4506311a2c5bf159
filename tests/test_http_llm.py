"""HTTPLLMProvider against a stub Ollama-protocol server.

The production provider for the reference-parity config (external
Ollama endpoint) — verifies the wire payloads (num_ctx, JSON mode,
num_predict, system, base64 vision) and the in-band error ladder
without any real endpoint.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from rag_dpo_tpu.providers.http_llm import HTTPLLMProvider


@pytest.fixture(scope="module")
def stub():
    """Ollama-shaped stub. Records every request payload."""
    seen: list[tuple[str, dict]] = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/api/tags":
                self._send({"models": [{"name": "stub"}]})
            else:
                self._send({}, 404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n))
            seen.append((self.path, payload))
            if self.path == "/api/generate":
                if payload.get("format") == "json":
                    self._send({"response": '{"intent": "factuel"}'})
                elif payload.get("images"):
                    self._send({"response": "image vue"})
                else:
                    self._send({"response": "réponse générée"})
            elif self.path == "/api/chat":
                if payload.get("stream"):
                    # Ollama NDJSON stream: one JSON object per line
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/x-ndjson")
                    self.end_headers()
                    for piece in ("réponse ", "en ", "flux"):
                        self.wfile.write(json.dumps({
                            "message": {"role": "assistant",
                                        "content": piece},
                            "done": False,
                        }).encode() + b"\n")
                    self.wfile.write(json.dumps(
                        {"message": {"content": ""},
                         "done": True}).encode() + b"\n")
                else:
                    self._send({"message": {"role": "assistant",
                                            "content": "réponse chat"}})
            else:
                self._send({}, 404)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", seen
    srv.shutdown()


def test_generate_payload_and_response(stub):
    url, seen = stub
    llm = HTTPLLMProvider(base_url=url, model="m", num_ctx=4096)
    resp = llm.generate("question ?", system="tu es un DPO",
                        temperature=0.2, max_tokens=77)
    assert resp.ok and resp.text == "réponse générée"
    path, payload = seen[-1]
    assert path == "/api/generate"
    assert payload["system"] == "tu es un DPO"
    assert payload["options"] == {"temperature": 0.2, "num_ctx": 4096,
                                  "num_predict": 77}
    assert payload["stream"] is False


def test_json_mode_sets_format(stub):
    url, seen = stub
    llm = HTTPLLMProvider(base_url=url)
    resp = llm.generate("classe", json_mode=True)
    assert resp.ok and json.loads(resp.text)["intent"] == "factuel"
    assert seen[-1][1]["format"] == "json"


def test_chat_messages_roundtrip(stub):
    url, seen = stub
    llm = HTTPLLMProvider(base_url=url)
    resp = llm.chat([{"role": "system", "content": "s"},
                     {"role": "user", "content": "u"}])
    assert resp.ok and resp.text == "réponse chat"
    assert seen[-1][0] == "/api/chat"
    assert seen[-1][1]["messages"][1]["content"] == "u"


def test_vision_sends_base64(stub):
    url, seen = stub
    llm = HTTPLLMProvider(base_url=url)
    resp = llm.generate_with_image("décris", b"\x89PNGdata")
    assert resp.ok and resp.text == "image vue"
    img = seen[-1][1]["images"][0]
    assert base64.b64decode(img) == b"\x89PNGdata"


def test_chat_stream_yields_ndjson_deltas(stub):
    """True Ollama streaming (stream=true NDJSON): the reference's
    backend supports it but its app never used it
    (`src/utils/llm_provider.py:150` hardcodes stream=False)."""
    url, seen = stub
    llm = HTTPLLMProvider(base_url=url)
    deltas = list(llm.chat_stream([{"role": "user", "content": "u"}],
                                  max_tokens=32))
    assert deltas == ["réponse ", "en ", "flux"]
    assert seen[-1][1]["stream"] is True
    assert seen[-1][1]["options"]["num_predict"] == 32


def test_availability_and_inband_errors(stub):
    url, _ = stub
    assert HTTPLLMProvider(base_url=url).is_available()
    dead = HTTPLLMProvider(base_url="http://127.0.0.1:9", timeout=0.5)
    assert not dead.is_available()
    resp = dead.generate("q")
    assert not resp.ok and resp.error and resp.text == ""
    resp = dead.chat([{"role": "user", "content": "q"}])
    assert not resp.ok and resp.error
