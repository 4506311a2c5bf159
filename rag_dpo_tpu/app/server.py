"""HTTP serving: a JSON query API over the pipeline.

Beyond the reference's Streamlit-only surface: a dependency-free HTTP
server exposing the framework for programmatic/production use:

    POST /query     {"question", "agent"?, "where_filter"?,
                     "enterprise_tags"?, "n_documents"?,
                     "conversation_history"?}
    POST /feedback  {"query_id", "rating", "comment"?}
    GET  /stats     query-log statistics (JSON)
    GET  /healthz   liveness + device inventory

Run: python -m rag_dpo_tpu.app.server [--port 8900] [--tpu] [--agent]
One pipeline instance serves sequentially (device programs are already
batched internally); put a real ASGI gateway in front for concurrency.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_handler(system: dict):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet access log
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload, ensure_ascii=False).encode()
            self.send_response(code)
            self.send_header("Content-Type",
                             "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_json(self) -> dict | None:
            try:
                length = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return None

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._send(200, {
                    "status": "ok",
                    "devices": [str(d) for d in jax.devices()],
                    "n_chunks": len(system["index"]) if system.get("index")
                    else None,
                })
            elif self.path.startswith("/stats"):
                self._send(200, system["qlog"].get_stats())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            data = self._read_json()
            if data is None:
                self._send(400, {"error": "invalid JSON body"})
                return
            if self.path == "/query":
                question = str(data.get("question", "")).strip()
                if not question:
                    self._send(400, {"error": "missing 'question'"})
                    return
                pipe = system["agent_pipe"] if data.get("agent") \
                    else system["pipe"]
                with lock:
                    resp = pipe.query(
                        question,
                        where_filter=data.get("where_filter"),
                        enterprise_tags=data.get("enterprise_tags"),
                        conversation_history=data.get(
                            "conversation_history"),
                        n_documents=int(data.get("n_documents", 5)),
                    )
                qid = system["qlog"].log_query(
                    resp, pipeline="agent" if data.get("agent")
                    else "native")
                self._send(200, {
                    "query_id": qid,
                    "answer": resp.answer,
                    "sources": resp.sources,
                    "intent": resp.intent,
                    "grounded": resp.grounded,
                    "timings": {
                        "retrieval": resp.retrieval_time,
                        "rerank": resp.rerank_time,
                        "generation": resp.generation_time,
                        "total": resp.total_time,
                    },
                    "error": resp.error,
                })
            elif self.path == "/feedback":
                qid = data.get("query_id")
                if not qid or "rating" not in data:
                    self._send(400,
                               {"error": "need query_id and rating"})
                    return
                try:
                    rating = int(data["rating"])
                except (TypeError, ValueError):
                    self._send(400, {"error": "rating must be an int"})
                    return
                system["qlog"].log_feedback(
                    qid, rating, data.get("comment", ""))
                self._send(200, {"ok": True})
            else:
                self._send(404, {"error": "not found"})

    return Handler


def build_system(agent_too: bool = True, llm=None) -> dict:
    from ..utils import QueryLogger, default_paths
    from .demo import build_demo_stack

    pipe, ctx = build_demo_stack(llm=llm, agent=False)
    agent_pipe = None
    if agent_too:
        agent_pipe, _ = build_demo_stack(llm=ctx["llm"], agent=True)
    paths = default_paths().ensure()
    return {
        "pipe": pipe,
        "agent_pipe": agent_pipe or pipe,
        "index": ctx["index"],
        "qlog": QueryLogger(paths.queries_log, paths.feedback_log),
    }


def serve(port: int = 8900, system: dict | None = None
          ) -> ThreadingHTTPServer:
    system = system or build_system()
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(system))
    return server


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", type=int, default=8900)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args(argv)
    if not args.tpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    server = serve(args.port)
    print(f"serving on :{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
