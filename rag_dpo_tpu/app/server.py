"""HTTP serving: a JSON query API over the pipeline.

Beyond the reference's Streamlit-only surface: a dependency-free HTTP
server exposing the framework for programmatic/production use:

    POST /query     {"question", "agent"?, "where_filter"?,
                     "enterprise_tags"?, "n_documents"?,
                     "conversation_history"?, "stream"?} — with
                    "stream": true the response is SSE: {"delta": ...}
                    events as the LLM produces the answer,
                    {"reset": true} when a quality retry regenerates,
                    then {"response": <full oneshot payload>} (markdown
                    fixup + citation renumbering applied on the
                    completed stream) and [DONE]
    POST /search    {"vectors": [[...f32 x dim...]] | "texts": [...],
                     "k"?, "where"?} — retrieval-only vector-search API
    POST /search (Content-Type: application/octet-stream) — binary fast
                    path: 16-byte header (magic 'RDPV', uint32 q, dim,
                    k, little-endian) + q·dim f32 vectors; response is
                    binary too (q, k, then [q,k] f32 scores + [q,k]
                    int32 row ids; resolve ids via JSON mode or
                    /healthz-advertised metadata endpoints). The JSON
                    float-text codec is the measured serving ceiling
                    (BENCHMARKS.md) — this path removes it.
    POST /feedback  {"query_id", "rating", "comment"?}
    GET  /stats     query-log statistics + micro-batcher stats (JSON)
    GET  /healthz   liveness + device inventory

Run: python -m rag_dpo_tpu.app.server [--port 8900] [--tpu] [--agent]

/query serves one full RAG pipeline run at a time (the LLM dominates);
/search MICRO-BATCHES concurrent requests into one device sweep
(serving/batcher.py): same-(k, where) searches arriving within the
collection window share a single corpus read, which is where the
batch-256 throughput on one chip comes from (BENCHMARKS.md).
"""

from __future__ import annotations

import json
import threading
from concurrent.futures import ThreadPoolExecutor
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# shared bounded pool for the OpenAI fan-out paths (multi-prompt
# /v1/completions, chat n>1): per-request thread spawning multiplied
# threads under concurrent clients on a ThreadingHTTPServer — a fixed
# pool bounds total fan-out concurrency server-wide while the
# continuous scheduler still co-batches whatever lands together
_FANOUT_LOCK = threading.Lock()
_FANOUT_POOL: ThreadPoolExecutor | None = None


def _fanout_map(fn, n: int) -> None:
    """Run fn(0..n-1) on the shared bounded pool (created lazily,
    16 workers). Callers pre-size a results list; fn writes into it."""
    global _FANOUT_POOL
    with _FANOUT_LOCK:
        if _FANOUT_POOL is None:
            _FANOUT_POOL = ThreadPoolExecutor(
                max_workers=16, thread_name_prefix="oai-fanout")
    list(_FANOUT_POOL.map(fn, range(n)))


def _prometheus_lines(tree: dict, prefix: str = "ragdpo"):
    """Flatten a stats tree into Prometheus text lines: numeric leaves
    become `ragdpo_<path> <value>`; bools count as 0/1; strings/lists
    are skipped (exposition format carries numbers only)."""
    import re

    for key, value in sorted(tree.items()):
        name = f"{prefix}_{re.sub(r'[^a-zA-Z0-9_]', '_', str(key))}"
        if isinstance(value, dict):
            yield from _prometheus_lines(value, name)
        elif isinstance(value, bool):
            yield f"{name} {int(value)}\n"
        elif isinstance(value, (int, float)):
            yield f"{name} {value}\n"


def _attach_batcher_stats(stats: dict, system: dict) -> None:
    """Micro-batcher counters (search/choose/encode/rerank) onto the
    stats tree — shared by /stats (JSON) and /metrics (Prometheus)."""
    from ..serving.batcher import batcher_stats, find_choose_batcher

    search = system.get("search")
    if search is not None:
        stats["search_batcher"] = batcher_stats(search.batcher)
    cb = find_choose_batcher(system)
    if cb is not None:
        stats["choose_batcher"] = batcher_stats(cb)
    qb = getattr(system.get("embedder"), "_query_batcher", None)
    if qb is not None:
        stats["encode_batcher"] = batcher_stats(qb)
    rb = getattr(getattr(system.get("pipe"), "reranker", None),
                 "_pair_batcher", None)
    if rb is not None:
        stats["rerank_batcher"] = batcher_stats(rb)


def _parse_penalties(data: dict, llm) -> tuple[dict, str | None]:
    """OpenAI-style frequency/presence penalties from a request body:
    validated floats in [-2, 2], forwarded only when nonzero AND the
    provider's generate() accepts them (the TPU continuous scheduler
    does; HTTP/fake providers don't — a silent drop would misreport
    capability, so unsupported+nonzero is a 400)."""
    import inspect

    pens: dict = {}
    for field in ("frequency_penalty", "presence_penalty"):
        raw = data.get(field)
        if raw is None:
            continue
        try:
            val = float(raw)
        except (TypeError, ValueError):
            return {}, f"{field} must be a number"
        if not -2.0 <= val <= 2.0:
            return {}, f"{field} must be in [-2, 2]"
        if val != 0.0:
            pens[field] = val
    if pens:
        try:
            params = inspect.signature(llm.generate).parameters
        except (TypeError, ValueError):
            params = {}
        if not all(k in params for k in pens):
            return {}, ("this provider does not support "
                        "frequency/presence penalties")
    return pens, None


def _parse_logit_bias(data: dict, llm) -> tuple[dict, str | None]:
    """OpenAI-style `logit_bias` {token_id: bias in [-100, 100]}:
    forwarded only when the provider's generate() accepts it —
    unsupported+set is a 400, not a silent drop (same capability
    contract as penalties/seed). Token ids are validated against the
    provider's vocab at submit time (the engine raises loudly)."""
    import inspect

    raw = data.get("logit_bias")
    if raw is None:
        return {}, None
    if not isinstance(raw, dict):
        return {}, "logit_bias must be an object"
    if not raw:                      # {} = explicit no-op (OpenAI)
        return {}, None
    if len(raw) > 300:
        return {}, "logit_bias supports at most 300 entries"
    vocab = getattr(getattr(llm, "config", None), "vocab_size", None)
    bias = {}
    for k, v in raw.items():
        try:
            t = int(k)
            b = float(v)
        except (TypeError, ValueError):
            return {}, ("logit_bias keys must be token ids and values "
                        "numbers")
        if not -100.0 <= b <= 100.0:
            return {}, "logit_bias values must be in [-100, 100]"
        if vocab is not None and not 0 <= t < vocab:
            return {}, (f"logit_bias token id {t} outside the "
                        f"provider vocab [0, {vocab})")
        bias[t] = b
    try:
        params = inspect.signature(llm.generate).parameters
    except (TypeError, ValueError):
        params = {}
    if "logit_bias" not in params:
        return {}, "this provider does not support logit_bias"
    return {"logit_bias": bias}, None


def _parse_seed(data: dict, llm) -> tuple[dict, str | None]:
    """OpenAI-style `seed` from a request body: same (prompt, params,
    seed) reproduces the same sampled generation (the TPU decode
    programs key every draw on seed + position). Forwarded only when
    the provider's generate() accepts it — unsupported+set is a 400,
    not a silent drop (same capability contract as the penalties)."""
    import inspect

    raw = data.get("seed")
    if raw is None:
        return {}, None
    try:
        val = int(raw)
    except (TypeError, ValueError):
        return {}, "seed must be an integer"
    try:
        params = inspect.signature(llm.generate).parameters
    except (TypeError, ValueError):
        params = {}
    if "seed" not in params:
        return {}, "this provider does not support seed"
    return {"seed": val}, None


def _sse_pump(stream, chunk, stops) -> None:
    """Pump text deltas into OpenAI chunk frames with host-side stop
    matching: withholding len(stop)-1 trailing chars keeps a stop
    sequence that spans two deltas intact; breaking on a match closes
    the inner stream, which CANCELS the decode (slot frees — same
    machinery as a client disconnect). Shared by the text and vision
    streaming branches of /v1/chat/completions."""
    hold = max((len(s) for s in stops), default=0) - 1
    acc, emitted = "", 0
    try:
        for delta in stream:
            if not delta:
                continue
            acc += delta
            cuts = [acc.find(s) for s in stops if s in acc]
            if cuts:
                out = acc[emitted:min(cuts)]
                if out:
                    chunk({"content": out})
                emitted = len(acc)
                break
            safe = len(acc) - hold if hold > 0 else len(acc)
            if safe > emitted:
                chunk({"content": acc[emitted:safe]})
                emitted = safe
        else:
            if emitted < len(acc):
                chunk({"content": acc[emitted:]})
    finally:
        close = getattr(stream, "close", None)
        if close:
            close()


def _flatten_multimodal(messages) -> tuple[list | None, bytes | None,
                                           str | None]:
    """OpenAI multimodal message content → (text messages, image
    bytes, error). `content` may be a plain string or a list of parts
    ({"type": "text"} / {"type": "image_url", "image_url": {"url":
    "data:<mime>;base64,..."}}). At most ONE image per request (the
    vision path splices one image into the prefix); only data: URLs —
    this server fetches nothing (zero-egress posture)."""
    import base64

    out: list = []
    image: bytes | None = None
    for m in messages:
        if not isinstance(m, dict) or not str(m.get("role", "")):
            return None, None, ("'messages' must be a non-empty list "
                                "of {role, content}")
        c = m.get("content")
        if isinstance(c, str):
            out.append({"role": str(m["role"]), "content": c})
            continue
        if not isinstance(c, list):
            return None, None, ("'content' must be a string or a "
                                "list of content parts")
        texts = []
        for part in c:
            ptype = part.get("type") if isinstance(part, dict) else None
            if ptype == "text" and isinstance(part.get("text"), str):
                texts.append(part["text"])
            elif ptype == "image_url":
                iu = part.get("image_url")
                # accept both the spec form {"url": ...} and the
                # common string shorthand
                url = iu.get("url", "") if isinstance(iu, dict) \
                    else (iu if isinstance(iu, str) else "")
                if not (isinstance(url, str)
                        and url.startswith("data:")):
                    return None, None, (
                        "image_url must be a data: URL (this server "
                        "does not fetch remote images)")
                if image is not None:
                    return None, None, "at most one image per request"
                try:
                    image = base64.b64decode(
                        url.split(",", 1)[1], validate=True)
                except Exception:
                    return None, None, "invalid base64 image data"
            else:
                return None, None, (
                    f"unsupported content part type: {ptype!r}")
        out.append({"role": str(m["role"]),
                    "content": "\n".join(texts)})
    return out, image, None


def _warm_coalesced(system: dict) -> None:
    """Pre-compile the coalescing batchers' programs (choose / encode /
    rerank) when their knobs are on — a first-shape compile through the
    axon remote path stalls a live request for minutes. Choose warms
    the intent template at short/medium/long question lengths (the
    s-bucket varies with question length); encode warms every batch
    bucket through the batcher; rerank warms one max_batch forward."""
    import time as _time

    from ..serving.batcher import find_choose_batcher

    # warm the provider that OWNS the choose batcher (mirrors
    # find_choose_batcher's llm→stream_llm fallback — review finding:
    # warming system['llm'] while the batcher lives on stream_llm left
    # the programs cold with no warning)
    llm = next((c for c in (system.get("llm"), system.get("stream_llm"))
                if getattr(getattr(c, "generator", None),
                           "_choose_batcher", None) is not None), None)
    if llm is not None and hasattr(llm, "warm_choose"):
        from ..rag.intent import CHOOSE_PROMPT, VALID_INTENTS

        t0 = _time.time()
        samples = [
            "Quel délai ?",
            "Comment mettre en place un registre des traitements "
            "pour une PME du secteur santé ?",
            ("Quelles obligations de sécurité, de documentation et "
             "d'information s'appliquent à un responsable de "
             "traitement qui déploie la vidéosurveillance, la "
             "géolocalisation et un registre des traitements dans "
             "plusieurs établissements ?"),
        ]
        for q in samples:
            llm.warm_choose(CHOOSE_PROMPT.format(question=q),
                            list(VALID_INTENTS))
        print(f"warm: compiled constrained-choice programs in "
              f"{_time.time() - t0:.1f}s")
    # short + long texts: production queries land in different SEQ
    # buckets, and a live coalesce can pad the BATCH up to the pow2
    # above the largest bucket ≤ max_batch (review finding: warming one
    # short text at small n left the very shapes live traffic hits cold)
    long_q = ("quelles obligations de sécurité et de documentation "
              "s'appliquent au responsable de traitement qui déploie "
              "la vidéosurveillance et la géolocalisation " * 3)
    embedder = system.get("embedder")
    qb = getattr(embedder, "_query_batcher", None)
    if qb is not None:
        t0 = _time.time()
        buckets = [n for n in
                   getattr(embedder.config, "batch_buckets", (1, 8, 64))
                   if n <= qb.max_batch]
        top = 1 << (qb.max_batch - 1).bit_length()
        if top not in buckets:
            buckets.append(min(top, qb.max_batch))
        for n in buckets:
            for text in ("registre des traitements", long_q):
                embedder.embed_queries([text] * n)
        print(f"warm: compiled coalesced-encode programs in "
              f"{_time.time() - t0:.1f}s")
    rr = getattr(system.get("pipe"), "reranker", None)
    rb = getattr(rr, "_pair_batcher", None)
    if rb is not None:
        # real rerank pairs are question + passage CHUNKS (hundreds of
        # tokens → the 256/512 seq buckets), not one short line
        t0 = _time.time()
        long_passage = " ".join(["le registre des activités de "
                                 "traitement recense les finalités, "
                                 "catégories de données et durées de "
                                 "conservation"] * 12)
        for passage in ("passage court", long_passage):
            rr.score_pairs([("question type", passage)]
                           * rb.max_batch)
        print(f"warm: compiled coalesced-rerank programs in "
              f"{_time.time() - t0:.1f}s")


def make_handler(system: dict):
    # /query concurrency: 1 by default (the LLM dominates and an external
    # endpoint serializes anyway). With a TPU-served LLM in
    # batch_concurrent mode, raise system["max_concurrent_queries"] so
    # concurrent generations share one batched decode
    # (providers/tpu_llm.py) — the retrieval stages are stateless and
    # JAX dispatch is thread-safe.
    lock = threading.BoundedSemaphore(
        int(system.get("max_concurrent_queries", 1)))
    if "search" not in system and system.get("index") is not None:
        from ..serving import batched_dense_search

        system["search"] = batched_dense_search(
            system["index"], max_batch=system.get("max_batch", 256),
            max_wait_ms=system.get("max_wait_ms", 3.0))

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
                stats = system["qlog"].get_stats()
                _attach_batcher_stats(stats, system)
                llm = system.get("llm")
                driver = getattr(llm, "_driver", None)
                if driver is not None:
                    eng = driver.engine
                    stats["decode_pool"] = dict(
                        eng.stats,
                        slots=eng.slots,
                        mean_occupancy=round(eng.occupancy, 2),
                        speculative=eng.speculative,
                        prefill_chunk=eng.prefill_chunk,
                        prefix_cache=eng.prefix_cache,
                        timeouts=driver.timeouts,
                        preemption=eng.preemption,
                        age_steps=eng.age_steps,
                    )
                self._send(200, stats)
            elif self.path.startswith("/metrics"):
                # Prometheus text exposition of the SAME stats tree
                # /stats serves (numeric leaves only) — scrapeable by a
                # standard prometheus/grafana stack with zero deps.
                # Capability superset: the reference has no metrics
                # endpoint at all.
                stats = system["qlog"].get_stats()
                llm = system.get("llm")
                driver = getattr(llm, "_driver", None)
                if driver is not None:
                    stats["decode_pool"] = dict(
                        driver.engine.stats,
                        slots=driver.engine.slots,
                        mean_occupancy=driver.engine.occupancy,
                        timeouts=driver.timeouts,
                    )
                _attach_batcher_stats(stats, system)
                body = "".join(_prometheus_lines(stats)).encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/v1/models":
                # OpenAI-compatible model listing (clients call this
                # before chat.completions)
                llm = system.get("stream_llm") or system.get("llm")
                name = getattr(llm, "model_name", "rag-dpo-tpu")
                self._send(200, {"object": "list", "data": [{
                    "id": name, "object": "model", "created": 0,
                    "owned_by": "rag-dpo-tpu"}]})
            else:
                self._send(404, {"error": "not found"})

        def _search_binary(self):
            """Binary /search: 'RDPV' + uint32 q, dim, k + q·dim f32 →
            'RDPR' + uint32 q, k + [q,k] f32 scores + [q,k] int32 row
            ids (-1 = empty). No JSON anywhere on the hot path."""
            import struct

            import numpy as np

            search = system.get("search")
            if search is None:
                self._send(503, {"error": "no index loaded"})
                return
            length = int(self.headers.get("Content-Length", 0))
            # sanity-check the header BEFORE buffering the body: read
            # just the 16-byte preamble, validate q/dim against the
            # loaded index, and only then read the payload (advisor
            # round-2: a huge Content-Length was fully buffered before
            # any check, and a wrong dim surfaced as a 500 from inside
            # the device sweep instead of a 400 here)
            if length < 16:
                self._send(400, {"error": "bad binary header "
                                          "(want magic 'RDPV')"})
                return
            head = self.rfile.read(16)
            if head[:4] != b"RDPV":
                self._send(400, {"error": "bad binary header "
                                          "(want magic 'RDPV')"})
                return
            q, dim, k = struct.unpack("<III", head[4:16])
            k = max(1, min(k, 1000))
            index = system.get("index")
            index_dim = getattr(getattr(index, "config", None), "dim",
                                None)
            if index_dim is not None and dim != index_dim:
                self._send(400, {"error":
                                 f"dim {dim} != index dim {index_dim}"})
                return
            if q == 0 or q > 65536:
                self._send(400, {"error": f"q={q} out of range "
                                          "(1..65536)"})
                return
            want = 16 + q * dim * 4
            if length != want:
                self._send(400, {"error":
                                 f"body length {length} != {want} "
                                 f"for q={q} dim={dim}"})
                return
            body = head + self.rfile.read(length - 16)
            if len(body) != want:
                self._send(400, {"error": "truncated body"})
                return
            vectors = np.frombuffer(body, np.float32, count=q * dim,
                                    offset=16).reshape(q, dim)
            where = None
            where_hdr = self.headers.get("X-Where")
            if where_hdr:
                try:
                    where = json.loads(where_hdr)
                except json.JSONDecodeError:
                    self._send(400, {"error": "X-Where must be JSON"})
                    return
            scores, rows = search(vectors, k, where=where)
            scores = np.ascontiguousarray(scores, np.float32)
            rows = np.ascontiguousarray(rows, np.int32)
            out = (b"RDPR" + struct.pack("<II", q, rows.shape[1])
                   + scores.tobytes() + rows.tobytes())
            self._raw_started = True
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def do_POST(self):
            # _raw_started: headers already on the wire (binary /search
            # or an SSE stream). A late exception must NOT write a second
            # status line into the open stream (advisor round-2): emit a
            # final SSE error event when streaming, else just close.
            self._raw_started = False
            self._sse_started = False
            try:
                self._do_post()
            except BrokenPipeError:  # client went away mid-response
                pass
            except Exception as e:  # noqa: BLE001 — JSON error, not a
                # reset connection, whatever the pipeline threw
                msg = f"{type(e).__name__}: {e}"[:500]
                try:
                    if self._sse_started:
                        payload = json.dumps({"error": msg},
                                             ensure_ascii=False)
                        self.wfile.write(
                            f"data: {payload}\n\ndata: [DONE]\n\n"
                            .encode())
                        self.close_connection = True
                    elif self._raw_started:
                        self.close_connection = True
                    else:
                        self._send(500, {"error": msg})
                except Exception:
                    pass

        def _do_post(self):
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            if (self.path.startswith("/search")
                    and ctype == "application/octet-stream"):
                self._search_binary()
                return
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
                try:
                    n_docs = max(1, min(int(data.get("n_documents", 5)),
                                        50))
                except (TypeError, ValueError):
                    self._send(400, {"error":
                                     "n_documents must be an int"})
                    return
                kwargs = dict(
                    where_filter=data.get("where_filter"),
                    enterprise_tags=data.get("enterprise_tags"),
                    conversation_history=data.get(
                        "conversation_history"),
                    n_documents=n_docs,
                )

                def payload(resp):
                    qid = system["qlog"].log_query(
                        resp, pipeline="agent" if data.get("agent")
                        else "native")
                    return {
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
                    }

                if data.get("stream"):
                    # SSE: answer deltas as the LLM produces them, a
                    # {"reset": true} event when a quality retry
                    # regenerates (client drops the draft), then the
                    # SAME final payload as the oneshot mode — with
                    # markdown fixup + cited-source renumbering applied
                    # on the completed stream — and [DONE]. The
                    # reference's chat blocks ~39 s with zero output
                    # (`pages/1_💬_Chat.py:312`); this path puts first
                    # tokens on the wire as soon as retrieval finishes.
                    with lock:
                        self._raw_started = True
                        self._sse_started = True
                        self.send_response(200)
                        self.send_header("Content-Type",
                                         "text/event-stream")
                        self.send_header("Cache-Control", "no-cache")
                        self.end_headers()

                        def emit(obj):
                            body = json.dumps(obj, ensure_ascii=False)
                            self.wfile.write(
                                f"data: {body}\n\n".encode())
                            self.wfile.flush()

                        # a disconnected client surfaces as a write
                        # error mid-loop; closing the stream cancels
                        # the in-flight decode request (its slot frees
                        # for the next caller) instead of generating
                        # max_new tokens into a dead socket
                        stream = pipe.query_stream(question, **kwargs)
                        try:
                            for ev, val in stream:
                                if ev == "delta":
                                    emit({"delta": val})
                                elif ev == "reset":
                                    emit({"reset": True})
                                elif ev == "response":
                                    emit({"response": payload(val)})
                        finally:
                            stream.close()
                        self.wfile.write(b"data: [DONE]\n\n")
                    return
                with lock:
                    resp = pipe.query(question, **kwargs)
                self._send(200, payload(resp))
            elif self.path == "/search":
                search = system.get("search")
                if search is None:
                    self._send(503, {"error": "no index loaded"})
                    return
                import numpy as np

                vectors = data.get("vectors")
                texts = data.get("texts")
                if vectors is None and not texts:
                    self._send(400, {"error":
                                     "need 'vectors' or 'texts'"})
                    return
                try:
                    if vectors is None:
                        emb = system["embedder"].embed(
                            [str(t) for t in texts])
                        vectors = np.asarray(emb["dense"], np.float32)
                    else:
                        vectors = np.asarray(vectors, np.float32)
                        if vectors.ndim != 2:
                            raise ValueError(
                                f"vectors must be [q, dim], got "
                                f"shape {vectors.shape}")
                except ValueError as e:
                    self._send(400, {"error": str(e)})
                    return
                try:
                    k = max(1, min(int(data.get("k", 10)), 1000))
                except (TypeError, ValueError):
                    self._send(400, {"error": "k must be an int"})
                    return
                scores, rows = search(vectors, k,
                                      where=data.get("where"))
                index = system["index"]
                out = []
                for qi in range(rows.shape[0]):
                    hits = []
                    for s_, r in zip(scores[qi], rows[qi]):
                        if r < 0:
                            continue
                        meta = index.meta.row(int(r))
                        hits.append({
                            "id": index.ids[int(r)],
                            "score": float(s_),
                            "metadata": {k_: v for k_, v in meta.items()
                                         if k_ != "text"},
                            "text": meta.get("text"),
                        })
                    out.append(hits)
                self._send(200, {"results": out})
            elif self.path == "/generate":
                # direct generation endpoint (TPU-served decoder). With
                # "stream": true → Server-Sent Events, one `data:` per
                # text delta (the reference's Ollama backend streams the
                # same way; its app never used it — capability superset)
                # prefer an explicitly-injected streaming provider,
                # else the system's own LLM (every provider exposes
                # generate_stream; review finding: 'stream_llm' was
                # only ever set by tests, so /generate 503'd through
                # the public entry points)
                llm = system.get("stream_llm") or system.get("llm")
                if llm is None or not hasattr(llm, "generate_stream"):
                    self._send(503, {"error": "no streaming LLM loaded"})
                    return
                prompt = str(data.get("prompt", "")).strip()
                if not prompt:
                    self._send(400, {"error": "missing 'prompt'"})
                    return
                max_new = max(1, min(int(data.get("max_tokens", 128)),
                                     2048))
                # per-request wall budget (continuous scheduler):
                # expiry cancels the decode and returns/streams the
                # partial answer with the deadline error in-band
                gen_kwargs: dict = {"max_tokens": max_new}
                timeout_s = data.get("timeout_s")
                if timeout_s is not None:
                    try:
                        timeout_s = float(timeout_s)
                    except (TypeError, ValueError):
                        timeout_s = 0.0
                    if not timeout_s > 0:       # rejects 0, <0 AND nan
                        self._send(400, {"error":
                                         "timeout_s must be > 0"})
                        return
                    if hasattr(llm, "request_timeout_s"):
                        gen_kwargs["timeout_s"] = timeout_s
                # scheduling class on the continuous scheduler (lower
                # admits first; default = the provider's own class)
                prio = data.get("priority")
                if prio is not None:
                    try:
                        prio = int(prio)
                    except (TypeError, ValueError):
                        self._send(400, {"error":
                                         "priority must be an int"})
                        return
                    if hasattr(llm, "priority"):
                        gen_kwargs["priority"] = prio
                pens, bad = _parse_penalties(data, llm)
                if bad:
                    self._send(400, {"error": bad})
                    return
                gen_kwargs.update(pens)
                sd, bad = _parse_seed(data, llm)
                if bad:
                    self._send(400, {"error": bad})
                    return
                gen_kwargs.update(sd)
                lb, bad = _parse_logit_bias(data, llm)
                if bad:
                    self._send(400, {"error": bad})
                    return
                gen_kwargs.update(lb)
                if not data.get("stream"):
                    resp = llm.generate(prompt, **gen_kwargs)
                    self._send(200, {"text": resp.text,
                                     "model": resp.model,
                                     "error": resp.error})
                    return
                # eager stream creation: input/capability errors from
                # the provider (logit_bias off the pool, bad budgets)
                # still 400 before any SSE byte
                try:
                    stream = llm.generate_stream(prompt, **gen_kwargs)
                except ValueError as e:
                    self._send(400, {"error": str(e)})
                    return
                self._raw_started = True
                self._sse_started = True
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                # close-on-disconnect cancels the decode request (see
                # /query stream) — the slot frees at the next step
                try:
                    for delta in stream:
                        payload = json.dumps({"delta": delta},
                                             ensure_ascii=False)
                        self.wfile.write(
                            f"data: {payload}\n\n".encode())
                        self.wfile.flush()
                finally:
                    stream.close()
                self.wfile.write(b"data: [DONE]\n\n")
            elif self.path == "/choose":
                # constrained decision endpoint: score candidate
                # continuations teacher-forced and return the best
                # (one prefill + one extend on the TPU decoder — the
                # answer is structurally one of `choices`; no sampling,
                # no JSON rescue). Capability superset: the reference's
                # constrained calls generate free text and regex it.
                llm = system.get("stream_llm") or system.get("llm")
                if llm is None or not hasattr(llm, "choose"):
                    self._send(503, {"error":
                                     "no choice-capable LLM loaded"})
                    return
                prompt = str(data.get("prompt", "")).strip()
                if not prompt:
                    self._send(400, {"error": "missing 'prompt'"})
                    return
                choices = data.get("choices")
                if (not isinstance(choices, list) or not choices
                        or not all(isinstance(c, str) and c.strip()
                                   for c in choices)):
                    self._send(400, {"error": "'choices' must be a "
                                     "non-empty list of strings"})
                    return
                if len(choices) > 64:
                    self._send(400, {"error": "too many choices "
                                     "(max 64)"})
                    return
                best, scores = llm.choose(
                    prompt, choices,
                    system=data.get("system"),
                    normalize=bool(data.get("normalize", True)))
                self._send(200, {"choice": best, "scores": scores})
            elif self.path == "/v1/embeddings":
                # OpenAI-compatible embeddings over the TPU-served
                # BGE-M3 encoder. Concurrent callers coalesce into one
                # encoder forward when query batching is on (the same
                # MicroBatcher the RAG path uses). `input_type:
                # "document"` (extension) routes through the corpus
                # encoder (full-length bucket) instead of the query
                # bucket. Capability superset — the reference only
                # consumes embeddings in-process, it never serves them.
                import numpy as np

                emb = system.get("embedder")
                if emb is None:
                    self._send(503, {"error": {"message":
                                     "no embedder loaded"}})
                    return
                raw = data.get("input")
                inputs = [raw] if isinstance(raw, str) else raw
                if (not isinstance(inputs, list) or not inputs
                        or not all(isinstance(x, str) and x
                                   for x in inputs)):
                    self._send(400, {"error": {"message":
                                     "'input' must be a non-empty "
                                     "string or list of non-empty "
                                     "strings"}})
                    return
                if len(inputs) > 256:
                    self._send(400, {"error": {"message":
                                     "too many inputs (max 256)"}})
                    return
                fmt = data.get("encoding_format", "float")
                if fmt not in ("float", "base64"):
                    self._send(400, {"error": {"message":
                                     "encoding_format must be 'float' "
                                     "or 'base64'"}})
                    return
                if data.get("dimensions") is not None:
                    self._send(400, {"error": {"message":
                                     "dimensions is not supported "
                                     "(fixed-width encoder)"}})
                    return
                itype = data.get("input_type", "query")
                if itype not in ("query", "document"):
                    self._send(400, {"error": {"message":
                                     "input_type must be 'query' or "
                                     "'document'"}})
                    return
                if itype == "query":
                    vecs = emb.embed_queries(inputs)
                else:
                    vecs = emb.embed(inputs)["dense"]
                if fmt == "base64":
                    import base64 as _b64

                    def _enc(v):
                        return _b64.b64encode(
                            np.asarray(v, np.float32).tobytes()
                        ).decode()
                else:
                    def _enc(v):
                        return [float(x) for x in v]
                n_tok = sum(len(t.split()) for t in inputs)
                self._send(200, {
                    "object": "list",
                    "data": [{"object": "embedding", "index": i,
                              "embedding": _enc(v)}
                             for i, v in enumerate(vecs)],
                    "model": data.get("model") or getattr(
                        emb.config, "name", "bge-m3-tpu"),
                    "usage": {"prompt_tokens": n_tok,
                              "total_tokens": n_tok}})
            elif self.path == "/v1/completions":
                # OpenAI legacy text-completions endpoint: plain
                # prompt → completion over the TPU decoder (the
                # surface older SDK pins and batch tooling still use).
                # Multiple prompts fan out concurrently (the slot pool
                # co-schedules them); stream is single-prompt.
                import time as _time
                import uuid as _uuid

                llm = system.get("stream_llm") or system.get("llm")
                if llm is None:
                    self._send(503, {"error": {"message":
                                               "no LLM loaded"}})
                    return
                for legacy in ("logprobs", "echo", "best_of",
                               "suffix", "n"):
                    v = data.get(legacy)
                    if v not in (None, False) and not (
                            legacy == "n" and v == 1):
                        self._send(400, {"error": {"message":
                                         f"'{legacy}' is not supported "
                                         "on /v1/completions — use "
                                         "/v1/chat/completions"}})
                        return
                raw = data.get("prompt")
                prompts = [raw] if isinstance(raw, str) else raw
                if (not isinstance(prompts, list) or not prompts
                        or not all(isinstance(p, str) and p
                                   for p in prompts)):
                    self._send(400, {"error": {"message":
                                     "'prompt' must be a non-empty "
                                     "string or list of non-empty "
                                     "strings"}})
                    return
                if len(prompts) > 8:
                    self._send(400, {"error": {"message":
                                     "too many prompts (max 8)"}})
                    return
                try:
                    temperature = float(data.get("temperature", 0.0))
                except (TypeError, ValueError):
                    self._send(400, {"error": {"message":
                                     "temperature must be a number"}})
                    return
                max_new = data.get("max_tokens")
                if max_new is not None:
                    try:
                        max_new = max(1, min(int(max_new), 2048))
                    except (TypeError, ValueError):
                        self._send(400, {"error": {"message":
                                         "max_tokens must be an int"}})
                        return
                stops = data.get("stop")
                if isinstance(stops, str):
                    stops = [stops]
                stops = [s for s in (stops or [])
                         if isinstance(s, str) and s][:4]
                pens, bad = _parse_penalties(data, llm)
                if bad:
                    self._send(400, {"error": {"message": bad}})
                    return
                sd, bad = _parse_seed(data, llm)
                if bad:
                    self._send(400, {"error": {"message": bad}})
                    return
                pens.update(sd)
                lb, bad = _parse_logit_bias(data, llm)
                if bad:
                    self._send(400, {"error": {"message": bad}})
                    return
                pens.update(lb)
                if data.get("stream") and len(prompts) > 1:
                    self._send(400, {"error": {"message":
                                     "stream is only supported for a "
                                     "single prompt"}})
                    return
                model = getattr(llm, "model_name", "rag-dpo-tpu")
                rid = f"cmpl-{_uuid.uuid4().hex[:24]}"
                created = int(_time.time())
                if data.get("stream"):
                    gs = getattr(llm, "generate_stream", None)
                    whole = stream = None
                    if gs is not None:
                        try:
                            stream = gs(prompts[0],
                                        temperature=temperature,
                                        max_tokens=max_new, **pens)
                        except ValueError as e:
                            self._send(400, {"error":
                                             {"message": str(e)}})
                            return
                    if gs is None:
                        # provider without native token streaming:
                        # blocking decode BEFORE the SSE headers (so
                        # errors stay clean 502s), one content chunk
                        r = llm.generate(
                            prompts[0], temperature=temperature,
                            max_tokens=max_new, **pens)
                        if not r.ok:
                            self._send(502, {"error":
                                             {"message": r.error}})
                            return
                        whole = r.text
                        cuts = [whole.find(s) for s in stops
                                if s in whole]
                        if cuts:
                            whole = whole[:min(cuts)]
                    self._raw_started = True
                    self._sse_started = True
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.end_headers()

                    def cchunk(text: str, finish=None):
                        payload = json.dumps({
                            "id": rid, "object": "text_completion",
                            "created": created, "model": model,
                            "choices": [{"index": 0, "text": text,
                                         "finish_reason": finish}]},
                            ensure_ascii=False)
                        self.wfile.write(
                            f"data: {payload}\n\n".encode())
                        self.wfile.flush()

                    if whole is not None:
                        if whole:
                            cchunk(whole)
                    else:
                        _sse_pump(stream,
                                  lambda d, finish=None: cchunk(
                                      d.get("content", ""), finish),
                                  stops)
                    cchunk("", finish="stop")
                    self.wfile.write(b"data: [DONE]\n\n")
                    self.wfile.flush()
                    return
                results: list = [None] * len(prompts)

                def _onep(i: int):
                    results[i] = llm.generate(
                        prompts[i], temperature=temperature,
                        max_tokens=max_new, **pens)

                if len(prompts) == 1:
                    _onep(0)
                else:
                    _fanout_map(_onep, len(prompts))
                bad_r = next((r for r in results if not r.ok), None)
                if bad_r is not None:
                    code = 400 if getattr(bad_r, "error_kind",
                                          None) == "input" else 502
                    self._send(code,
                               {"error": {"message": bad_r.error}})
                    return
                texts = []
                for r in results:
                    text = r.text
                    cuts = [text.find(s) for s in stops if s in text]
                    if cuts:
                        text = text[:min(cuts)]
                    texts.append(text)
                n_prompt = sum(len(p.split()) for p in prompts)
                n_out = sum(len(t.split()) for t in texts)
                self._send(200, {
                    "id": rid, "object": "text_completion",
                    "created": created, "model": model,
                    "choices": [{"index": i, "text": t,
                                 "finish_reason": "stop"}
                                for i, t in enumerate(texts)],
                    "usage": {"prompt_tokens": n_prompt,
                              "completion_tokens": n_out,
                              "total_tokens": n_prompt + n_out}})
            elif self.path == "/v1/chat/completions":
                # OpenAI-compatible chat endpoint over the TPU-served
                # decoder (every provider is streamable — base
                # chat_stream): standard clients (openai SDK, curl
                # recipes, LibreChat-style UIs) can point at this
                # server unchanged. Capability superset — the reference
                # only CONSUMES an LLM API, it never serves one.
                import time as _time
                import uuid as _uuid

                llm = system.get("stream_llm") or system.get("llm")
                if llm is None:
                    self._send(503, {"error": {"message":
                                               "no LLM loaded"}})
                    return
                messages = data.get("messages")
                if not isinstance(messages, list) or not messages:
                    self._send(400, {"error": {"message":
                                     "'messages' must be a non-empty "
                                     "list of {role, content}"}})
                    return
                # multimodal content parts (vision) flatten here;
                # plain-string content passes through unchanged
                messages, image, bad = _flatten_multimodal(messages)
                if bad:
                    self._send(400, {"error": {"message": bad}})
                    return
                try:
                    temperature = float(data.get("temperature", 0.0))
                except (TypeError, ValueError):
                    self._send(400, {"error": {"message":
                                     "temperature must be a number"}})
                    return
                max_new = data.get("max_tokens")
                if max_new is not None:
                    try:
                        max_new = max(1, min(int(max_new), 2048))
                    except (TypeError, ValueError):
                        self._send(400, {"error": {"message":
                                         "max_tokens must be an int"}})
                        return
                stops = data.get("stop")
                if isinstance(stops, str):
                    stops = [stops]
                stops = [s for s in (stops or [])
                         if isinstance(s, str) and s][:4]
                pens, bad = _parse_penalties(data, llm)
                if bad:
                    self._send(400, {"error": {"message": bad}})
                    return
                sd, bad = _parse_seed(data, llm)
                if bad:
                    self._send(400, {"error": {"message": bad}})
                    return
                seed_kw = dict(sd)  # vision branch needs it separately
                pens.update(sd)    # rides the same **kwargs forward
                lb, bad = _parse_logit_bias(data, llm)
                if bad:
                    self._send(400, {"error": {"message": bad}})
                    return
                pens.update(lb)    # text paths; the vision branch
                #                    forwards it via its own vkw check
                want_lp = bool(data.get("logprobs"))
                top_lp = data.get("top_logprobs")
                if top_lp is not None:
                    from ..models.generate import LOGPROB_TOPK

                    try:
                        top_lp = int(top_lp)
                    except (TypeError, ValueError):
                        top_lp = -1
                    if not 0 <= top_lp <= LOGPROB_TOPK:
                        self._send(400, {"error": {"message":
                                         "top_logprobs must be an "
                                         "integer in "
                                         f"[0, {LOGPROB_TOPK}]"}})
                        return
                    if not want_lp:
                        self._send(400, {"error": {"message":
                                         "top_logprobs requires "
                                         "logprobs: true"}})
                        return
                if want_lp:
                    import inspect as _insp

                    try:
                        gp = _insp.signature(llm.generate).parameters
                    except (TypeError, ValueError):
                        gp = {}
                    if "logprobs" not in gp:
                        self._send(400, {"error": {"message":
                                         "this provider does not "
                                         "support logprobs"}})
                        return
                    if data.get("stream") or image is not None:
                        self._send(400, {"error": {"message":
                                         "logprobs are only supported "
                                         "for non-streaming text "
                                         "requests"}})
                        return
                    pens["logprobs"] = top_lp or 0
                raw_n = data.get("n")
                try:
                    n_choices = 1 if raw_n is None else int(raw_n)
                except (TypeError, ValueError):
                    n_choices = 0
                if not 1 <= n_choices <= 8:
                    self._send(400, {"error": {"message":
                                     "n must be an integer in "
                                     "[1, 8]"}})
                    return
                if n_choices > 1 and (data.get("stream")
                                      or image is not None):
                    self._send(400, {"error": {"message":
                                     "n > 1 is only supported for "
                                     "non-streaming text requests"}})
                    return
                model = getattr(llm, "model_name", "rag-dpo-tpu")
                rid = f"chatcmpl-{_uuid.uuid4().hex[:24]}"
                created = int(_time.time())
                if image is not None:
                    # vision turn (models/llava.py through the
                    # provider); capability failure is the client's
                    # 400, anything else a 502. Penalties forward only
                    # when the provider's image path takes them (the
                    # continuous pool does; the direct decode programs
                    # don't) — reject rather than silently ignore.
                    sys_txt, parts = None, []
                    for m in messages:
                        if m["role"] == "system":
                            sys_txt = m["content"]
                        else:
                            parts.append(
                                f"{m['role']}: {m['content']}")
                    vprompt = "\n\n".join(
                        ([sys_txt] if sys_txt else []) + parts)
                    vkw = {}
                    import inspect as _inspect

                    vparams = _inspect.signature(
                        llm.generate_with_image).parameters
                    if "max_tokens" in vparams and max_new is not None:
                        vkw["max_tokens"] = max_new
                    if seed_kw:
                        if "seed" not in vparams:
                            self._send(400, {"error": {"message":
                                             "this provider does not "
                                             "support seed with image "
                                             "input"}})
                            return
                        vkw["seed"] = seed_kw["seed"]
                    vpen = {k: v for k, v in pens.items()
                            if k in ("frequency_penalty",
                                     "presence_penalty", "logit_bias")}
                    if vpen:
                        if not all(k in vparams for k in vpen):
                            self._send(400, {"error": {"message":
                                             "penalties/logit_bias are "
                                             "not supported with image "
                                             "input"}})
                            return
                        vkw.update(vpen)
                    vstream_fn = getattr(
                        llm, "generate_with_image_stream", None)
                    if not data.get("stream") or vstream_fn is None:
                        resp = llm.generate_with_image(
                            vprompt, image, temperature=temperature,
                            **vkw)
                        if not resp.ok:
                            # structural classification: the provider
                            # tags caller/capability errors with
                            # error_kind="input" (bad image bytes, no
                            # vision tower, no decode budget, penalties
                            # off the pool) — no substring matching
                            code = 400 if getattr(
                                resp, "error_kind", None) == "input" \
                                else 502
                            self._send(code, {"error":
                                              {"message": resp.error}})
                            return
                        text = resp.text
                        cuts = [text.find(s) for s in stops
                                if s in text]
                        if cuts:
                            text = text[:min(cuts)]
                    else:
                        # TRUE streaming: the request joins the slot
                        # pool (submit_embeds) and deltas arrive per
                        # decoded token. Input/capability errors raise
                        # EAGERLY from the provider — before any SSE
                        # byte — so they still map to clean 4xx/5xx.
                        try:
                            vstream = vstream_fn(
                                vprompt, image,
                                temperature=temperature, **vkw)
                        except ValueError as e:
                            self._send(400, {"error":
                                             {"message": str(e)}})
                            return
                        except Exception as e:  # noqa: BLE001
                            self._send(502, {"error":
                                             {"message": str(e)}})
                            return
                        text = None
                    if not data.get("stream"):
                        n_prompt = sum(len(str(m["content"]).split())
                                       for m in messages)
                        # image tokens count toward prompt usage
                        # (OpenAI semantics)
                        lcfg = getattr(getattr(llm, "_llava", None),
                                       "config", None)
                        if lcfg is not None:
                            n_prompt += lcfg.num_image_tokens
                        self._send(200, {
                            "id": rid, "object": "chat.completion",
                            "created": created, "model": model,
                            "choices": [{
                                "index": 0,
                                "message": {"role": "assistant",
                                            "content": text},
                                "finish_reason": "stop"}],
                            "usage": {
                                "prompt_tokens": n_prompt,
                                "completion_tokens": len(text.split()),
                                "total_tokens": n_prompt
                                + len(text.split())},
                        })
                        return
                    self._raw_started = True
                    self._sse_started = True
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.end_headers()

                    def vchunk(delta: dict, finish=None):
                        payload = json.dumps({
                            "id": rid,
                            "object": "chat.completion.chunk",
                            "created": created, "model": model,
                            "choices": [{"index": 0, "delta": delta,
                                         "finish_reason": finish}]},
                            ensure_ascii=False)
                        self.wfile.write(
                            f"data: {payload}\n\n".encode())
                        self.wfile.flush()

                    vchunk({"role": "assistant", "content": ""})
                    if text is not None:
                        # one-chunk fallback (provider has no vision
                        # stream): stream shape parity only
                        if text:
                            vchunk({"content": text})
                    else:
                        _sse_pump(vstream, vchunk, stops)
                    vchunk({}, finish="stop")
                    self.wfile.write(b"data: [DONE]\n\n")
                    self.wfile.flush()
                    return
                if not data.get("stream"):
                    # n generations run CONCURRENTLY — on the slot
                    # pool they co-reside in the same weight sweeps;
                    # with a user seed, choice i samples seed+i (each
                    # an independent position-keyed stream)
                    results: list = [None] * n_choices

                    def _one(i: int):
                        kw = dict(pens)
                        if n_choices > 1 and kw.get("seed") is not None:
                            kw["seed"] = kw["seed"] + i
                        results[i] = llm.chat(
                            messages, temperature=temperature,
                            max_tokens=max_new, **kw)

                    if n_choices == 1:
                        _one(0)
                    elif temperature <= 0:
                        # greedy decoding is deterministic: n>1 at
                        # temperature 0 would return n identical
                        # choices — generate once, replicate (OpenAI
                        # returns identical choices here too; we just
                        # skip the redundant compute)
                        _one(0)
                        results = [results[0]] * n_choices
                    else:
                        _fanout_map(_one, n_choices)
                    bad_r = next((r for r in results if not r.ok), None)
                    if bad_r is not None:
                        code = 400 if getattr(bad_r, "error_kind",
                                              None) == "input" else 502
                        self._send(code, {"error":
                                          {"message": bad_r.error}})
                        return
                    texts, lpblocks = [], []
                    for r in results:
                        text = r.text
                        cuts = [text.find(s) for s in stops
                                if s in text]
                        if cuts:
                            text = text[:min(cuts)]
                        texts.append(text)
                        if want_lp and r.logprobs is not None:
                            # align with the stop-truncated content:
                            # compare accumulated text length against
                            # the cut index directly, so the entry
                            # whose token completes (or straddles) the
                            # stop sequence is dropped — logprobs.
                            # content never leaks tokens past the cut
                            cut = min(cuts) if cuts else None
                            entries, pos = [], 0
                            for e in r.logprobs:
                                if cut is not None and \
                                        pos + len(e["token"]) > cut:
                                    break
                                entries.append(e)
                                pos += len(e["token"])
                            lpblocks.append({"content": [
                                {"token": e["token"],
                                 "logprob": e["logprob"],
                                 "top_logprobs": [
                                     {"token": x["token"],
                                      "logprob": x["logprob"]}
                                     for x in e["top_logprobs"]]}
                                for e in entries]})
                        else:
                            lpblocks.append(None)
                    n_prompt = sum(len(str(m["content"]).split())
                                   for m in messages)
                    n_out = sum(len(t.split()) for t in texts)
                    self._send(200, {
                        "id": rid, "object": "chat.completion",
                        "created": created, "model": model,
                        "choices": [{"index": i,
                                     "message": {"role": "assistant",
                                                 "content": t},
                                     "logprobs": lpblocks[i],
                                     "finish_reason": "stop"}
                                    for i, t in enumerate(texts)],
                        "usage": {
                            "prompt_tokens": n_prompt,
                            "completion_tokens": n_out,
                            "total_tokens": n_prompt + n_out},
                    })
                    return
                # create the stream BEFORE the SSE headers: eager
                # providers (the TPU one) raise input/capability
                # errors at call time, which still map to clean 4xx
                try:
                    stream = llm.chat_stream(messages,
                                             temperature=temperature,
                                             max_tokens=max_new,
                                             **pens)
                except ValueError as e:
                    self._send(400, {"error": {"message": str(e)}})
                    return
                self._raw_started = True
                self._sse_started = True
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()

                def chunk(delta: dict, finish=None):
                    payload = json.dumps({
                        "id": rid, "object": "chat.completion.chunk",
                        "created": created, "model": model,
                        "choices": [{"index": 0, "delta": delta,
                                     "finish_reason": finish}]},
                        ensure_ascii=False)
                    self.wfile.write(f"data: {payload}\n\n".encode())
                    self.wfile.flush()

                chunk({"role": "assistant", "content": ""})
                _sse_pump(stream, chunk, stops)
                chunk({}, finish="stop")
                self.wfile.write(b"data: [DONE]\n\n")
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
    """Production stack when a saved index checkpoint exists (the
    config-driven bootstrap — honors `llm.mode=tpu`, the continuous
    scheduler, RAGDPO_* env overlays, …); demo stack otherwise. Same
    selection rule as the CLI (`app/cli.py::_stack`)."""
    from ..utils import QueryLogger, default_paths

    paths = default_paths().ensure()
    from ..bootstrap import try_build_stack

    stack = try_build_stack(paths, llm=llm)
    if stack is not None:
        # concurrent /query requests only help when the provider can
        # co-schedule generations (slot pool / micro-batcher) — the
        # handler's semaphore otherwise serializes at 1 and a 16-slot
        # pool would never see more than one resident request
        cfg_llm = stack.config.llm
        concurrency = (cfg_llm.max_batch
                       if cfg_llm.mode == "tpu"
                       and cfg_llm.scheduler in ("continuous",
                                                 "batch") else 1)
        return {
            "pipe": stack.pipeline,
            "agent_pipe": stack.agent if agent_too else stack.pipeline,
            "index": stack.index,
            "embedder": stack.embedder,
            "llm": stack.llm,
            "qlog": stack.query_logger,
            "max_concurrent_queries": concurrency,
        }
    from .demo import build_demo_stack

    pipe, ctx = build_demo_stack(llm=llm, agent=False)
    agent_pipe = None
    if agent_too:
        agent_pipe, _ = build_demo_stack(llm=ctx["llm"], agent=True)
    return {
        "pipe": pipe,
        "agent_pipe": agent_pipe or pipe,
        "index": ctx["index"],
        "embedder": ctx["embedder"],
        "llm": ctx["llm"],
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
    ap.add_argument("--warm", action="store_true",
                    help="pre-compile search programs for every "
                         "power-of-two batch up to max_batch before "
                         "accepting traffic (no first-request compile "
                         "stall)")
    args = ap.parse_args(argv)
    if not args.tpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    system = build_system()
    if args.warm and system.get("index") is not None:
        import time as _time

        t0 = _time.time()
        max_batch = int(system.get("max_batch", 256))
        sizes, b = [], 1
        while b <= max_batch:
            sizes.append(b)
            b *= 2
        system["index"].warm(sizes)
        print(f"warm: compiled search programs for batches {sizes} "
              f"in {_time.time() - t0:.1f}s")
    if args.warm and hasattr(system.get("llm"), "warm_decoder"):
        import time as _time

        t0 = _time.time()
        system["llm"].warm_decoder()
        print(f"warm: compiled decode-pool programs in "
              f"{_time.time() - t0:.1f}s")
    if args.warm:
        _warm_coalesced(system)
    server = serve(args.port, system=system)
    print(f"serving on :{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
