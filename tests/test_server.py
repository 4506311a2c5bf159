import json
import threading
import urllib.request

import pytest

from rag_dpo_tpu.app.server import build_system, serve


@pytest.fixture(scope="module")
def server(tmp_path_factory, monkeypatch_module=None):
    import os

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("srv"))
    system = build_system(agent_too=False)
    srv = serve(port=0, system=system)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        data = json.loads(r.read())
    assert data["status"] == "ok"
    assert data["n_chunks"] == 8


def test_query_and_feedback_flow(server):
    code, data = _post(server, "/query",
                       {"question": "Quel délai pour notifier une "
                                    "violation à la CNIL ?"})
    assert code == 200
    assert data["answer"] and data["query_id"]
    assert data["timings"]["total"] > 0
    code, fb = _post(server, "/feedback",
                     {"query_id": data["query_id"], "rating": 1})
    assert code == 200 and fb["ok"]
    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["n_queries"] >= 1


def test_metrics_prometheus_format(server):
    """GET /metrics serves the stats tree as Prometheus text lines
    (numeric leaves only, nested keys joined by underscores)."""
    _post(server, "/query", {"question": "Quel registre tenir ?"})
    with urllib.request.urlopen(server + "/metrics", timeout=60) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    lines = [ln for ln in body.splitlines() if ln]
    assert lines, body
    for ln in lines:
        name, _, value = ln.partition(" ")
        assert name.startswith("ragdpo_"), ln
        float(value)                     # every sample parses numeric
    assert any(ln.startswith("ragdpo_n_queries ") for ln in lines), body


def test_query_validation(server):
    code, data = _post(server, "/query", {})
    assert code == 400 and "question" in data["error"]
    code, data = _post(server, "/feedback", {"rating": 1})
    assert code == 400
    req = urllib.request.Request(server + "/query", data=b"not json",
                                 headers={"Content-Type":
                                          "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_unknown_route(server):
    try:
        urllib.request.urlopen(server + "/nope", timeout=30)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_search_endpoint_vectors_and_texts(server):
    # by text (embedded server-side)
    code, data = _post(server, "/search",
                       {"texts": ["délai de notification violation"],
                        "k": 3})
    assert code == 200 and len(data["results"]) == 1
    hits = data["results"][0]
    assert hits and all("id" in h and "score" in h for h in hits)
    # by raw vector: query with a hit's own embedding via texts roundtrip
    code2, data2 = _post(server, "/search",
                         {"texts": ["registre des traitements"],
                          "k": 2, "where": None})
    assert code2 == 200
    # validation
    code3, data3 = _post(server, "/search", {})
    assert code3 == 400
    code4, data4 = _post(server, "/search", {"vectors": [1, 2, 3]})
    assert code4 == 400


def test_search_endpoint_concurrent_batches(server):
    import json as _json
    import threading
    import urllib.request

    results = []

    def call(text):
        req = urllib.request.Request(
            server + "/search",
            data=_json.dumps({"texts": [text], "k": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            results.append(_json.loads(r.read()))

    threads = [threading.Thread(target=call, args=(t,)) for t in
               ["durée de conservation", "sous-traitant", "AIPD",
                "droit d'accès", "registre", "sanction CNIL"]]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 6 and all(r["results"][0] for r in results)
    # stats expose the batcher
    with urllib.request.urlopen(server + "/stats") as r:
        stats = _json.loads(r.read())
    assert stats["search_batcher"]["n_requests"] >= 6


def test_bad_params_return_json_errors(server):
    code, data = _post(server, "/search",
                       {"texts": ["délai violation"], "k": "beaucoup"})
    assert code == 400 and "k" in data["error"]
    code, data = _post(server, "/query",
                       {"question": "q", "n_documents": "douze"})
    assert code == 400 and "n_documents" in data["error"]
    # out-of-range k clamps instead of crashing the device path
    code, data = _post(server, "/search",
                       {"texts": ["délai violation"], "k": 99999})
    assert code == 200 and data["results"]


def test_oversized_search_batch_splits(server):
    # > max_batch rows go through the batcher's slab path and come back
    # stitched in order
    code, data = _post(server, "/search",
                       {"texts": ["notification violation"] * 3,
                        "k": 2})
    assert code == 200 and len(data["results"]) == 3


def test_concurrent_queries_with_semaphore(tmp_path_factory):
    """max_concurrent_queries > 1 admits parallel /query requests; both
    complete correctly (components are stateless across requests)."""
    import os
    import threading as th

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("srv2"))
    system = build_system(agent_too=False)
    system["max_concurrent_queries"] = 4
    srv = serve(port=0, system=system)
    t = th.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    out = {}

    def ask(i):
        out[i] = _post(url, "/query",
                       {"question": f"Quel délai de notification ? v{i}"})

    threads = [th.Thread(target=ask, args=(i,)) for i in range(3)]
    for x in threads:
        x.start()
    for x in threads:
        x.join()
    for i in range(3):
        code, data = out[i]
        assert code == 200 and data["answer"]
    srv.shutdown()


def test_binary_search_roundtrip(server):
    """Binary /search: raw f32 vectors in, scores+row-ids out — results
    must match the JSON path's ids."""
    import struct

    import numpy as np

    # JSON reference for the same query texts is not possible (binary
    # takes vectors), so embed via the JSON texts path first
    code, data = _post(server, "/search",
                       {"texts": ["délai de notification violation"],
                        "k": 3})
    assert code == 200
    json_ids = [h["id"] for h in data["results"][0]]

    # craft the same query vector via the demo embedder
    from rag_dpo_tpu.app.server import build_system  # noqa: F401

    # fetch dim from healthz-independent route: use the stats of the
    # first JSON hit — instead, embed locally through the same system
    # is not accessible here; use random vectors to verify the protocol
    rng = np.random.default_rng(0)
    q, dim, k = 2, 64, 4
    vecs = rng.standard_normal((q, dim)).astype(np.float32)
    body = b"RDPV" + struct.pack("<III", q, dim, k) + vecs.tobytes()
    req = urllib.request.Request(
        server + "/search", data=body,
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=120) as r:
        out = r.read()
    assert out[:4] == b"RDPR"
    oq, ok = struct.unpack("<II", out[4:12])
    assert oq == q and ok == k
    scores = np.frombuffer(out, np.float32, count=q * ok, offset=12)
    rows = np.frombuffer(out, np.int32, count=q * ok,
                         offset=12 + q * ok * 4).reshape(q, ok)
    assert rows.shape == (q, k)
    assert (rows >= -1).all()
    assert json_ids  # JSON path still fine alongside

    # filters ride the X-Where header in binary mode
    req = urllib.request.Request(
        server + "/search", data=body,
        headers={"Content-Type": "application/octet-stream",
                 "X-Where": '{"nature": "GUIDE"}'})
    with urllib.request.urlopen(req, timeout=120) as r:
        out2 = r.read()
    assert out2[:4] == b"RDPR"
    rows2 = np.frombuffer(out2, np.int32, count=q * ok,
                          offset=12 + q * ok * 4).reshape(q, ok)
    assert (rows2 >= -1).all()

    # malformed header → JSON error, not a reset
    req = urllib.request.Request(
        server + "/search", data=b"XXXX....",
        headers={"Content-Type": "application/octet-stream"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "should 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_generate_sse_streaming(tmp_path_factory):
    """SSE /generate streams deltas that concatenate to the
    non-streaming output (greedy, TPU-served tiny decoder)."""
    import json as _json
    import os
    import threading as th

    import jax.numpy as jnp

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("sse"))
    system = build_system(agent_too=False)
    system["stream_llm"] = TPULLMProvider(
        DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                           dtype=jnp.float32), max_new_tokens=12)
    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    code, data = _post(url, "/generate",
                       {"prompt": "registre des traitements",
                        "max_tokens": 12})
    assert code == 200 and data["text"], data

    req = urllib.request.Request(
        url + "/generate",
        data=_json.dumps({"prompt": "registre des traitements",
                          "max_tokens": 12, "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    deltas = []
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            body = line[6:]
            if body == "[DONE]":
                break
            deltas.append(_json.loads(body)["delta"])
    assert deltas and "".join(deltas) == data["text"]
    srv.shutdown()


def test_choose_endpoint(tmp_path_factory):
    """/choose scores candidates on the TPU decoder and always returns
    one of them; validation rejects bad payloads; a system without a
    choice-capable provider 503s."""
    import os
    import threading as th

    import jax.numpy as jnp

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("cho"))
    system = build_system(agent_too=False)
    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    code, data = _post(url, "/choose",
                       {"prompt": "x", "choices": ["a", "b"]})
    assert code == 503          # FakeLLM has no choose()
    srv.shutdown()

    system["stream_llm"] = TPULLMProvider(
        DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                           dtype=jnp.float32))
    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    choices = ["factuel", "methodologique", "refus"]
    code, data = _post(url, "/choose",
                       {"prompt": "Quel délai CNIL ? Intention :",
                        "choices": choices})
    assert code == 200 and data["choice"] in choices
    assert len(data["scores"]) == 3
    code, data = _post(url, "/choose", {"prompt": "x"})
    assert code == 400
    code, data = _post(url, "/choose",
                       {"prompt": "x", "choices": []})
    assert code == 400
    code, data = _post(url, "/choose",
                       {"prompt": "x", "choices": ["a", 3]})
    assert code == 400
    code, data = _post(url, "/choose",
                       {"prompt": "", "choices": ["a"]})
    assert code == 400
    code, data = _post(url, "/choose",
                       {"prompt": "x",
                        "choices": [str(i) for i in range(65)]})
    assert code == 400
    # choose batching enabled → its counters ride /stats and /metrics
    system["stream_llm"].generator.enable_choose_batching(max_batch=4)
    code, data = _post(url, "/choose",
                       {"prompt": "Quel délai CNIL ? Intention :",
                        "choices": choices})
    assert code == 200
    with urllib.request.urlopen(url + "/stats") as r:
        stats = json.loads(r.read())
    assert stats["choose_batcher"]["n_requests"] >= 1
    with urllib.request.urlopen(url + "/metrics") as r:
        text = r.read().decode()
    assert "ragdpo_choose_batcher_n_requests" in text
    srv.shutdown()


def test_openai_compatible_chat_completions(tmp_path_factory):
    """/v1/chat/completions speaks the OpenAI schema over the TPU
    decoder: non-stream result, SSE chunks that concatenate to it,
    /v1/models listing, and 400s on malformed payloads."""
    import json as _json
    import os
    import threading as th

    import jax.numpy as jnp

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("oai"))
    system = build_system(agent_too=False)
    system["stream_llm"] = TPULLMProvider(
        DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                           dtype=jnp.float32), max_new_tokens=12)
    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    with urllib.request.urlopen(url + "/v1/models", timeout=30) as r:
        models = _json.loads(r.read())
    assert models["object"] == "list" and models["data"][0]["id"]

    msgs = [{"role": "system", "content": "Assistant RGPD."},
            {"role": "user", "content": "registre des traitements"}]
    code, data = _post(url, "/v1/chat/completions",
                       {"messages": msgs, "max_tokens": 12})
    assert code == 200, data
    assert data["object"] == "chat.completion"
    text = data["choices"][0]["message"]["content"]
    assert text and data["choices"][0]["finish_reason"] == "stop"
    assert data["usage"]["total_tokens"] > 0

    req = urllib.request.Request(
        url + "/v1/chat/completions",
        data=_json.dumps({"messages": msgs, "max_tokens": 12,
                          "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    deltas, finishes = [], []
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            body = line[6:]
            if body == "[DONE]":
                break
            obj = _json.loads(body)
            assert obj["object"] == "chat.completion.chunk"
            delta = obj["choices"][0]["delta"]
            if "content" in delta:
                deltas.append(delta["content"])
            finishes.append(obj["choices"][0]["finish_reason"])
    assert "".join(deltas) == text       # greedy stream == one-shot
    assert finishes[-1] == "stop"

    # stop sequences: pick a substring from the middle of the known
    # greedy answer; both modes must truncate before it (the stream
    # must not leak the withheld tail even when the stop spans deltas)
    if len(text) > 8:
        stop = text[len(text) // 2: len(text) // 2 + 3]
        code, data = _post(url, "/v1/chat/completions",
                           {"messages": msgs, "max_tokens": 12,
                            "stop": stop})
        cut = data["choices"][0]["message"]["content"]
        assert stop not in cut and text.startswith(cut), (stop, cut)
        req = urllib.request.Request(
            url + "/v1/chat/completions",
            data=_json.dumps({"messages": msgs, "max_tokens": 12,
                              "stream": True, "stop": [stop]}).encode(),
            headers={"Content-Type": "application/json"})
        sdeltas = []
        with urllib.request.urlopen(req, timeout=300) as r:
            for line in r:
                line = line.decode().strip()
                if not line.startswith("data: ") or line == "data: [DONE]":
                    continue
                obj = _json.loads(line[6:])
                d = obj["choices"][0]["delta"]
                if "content" in d:
                    sdeltas.append(d["content"])
        assert "".join(sdeltas) == cut, (cut, sdeltas)

    code, _ = _post(url, "/v1/chat/completions", {"messages": []})
    assert code == 400
    code, _ = _post(url, "/v1/chat/completions",
                    {"messages": [{"role": "user"}]})
    assert code == 400
    code, _ = _post(url, "/v1/chat/completions",
                    {"messages": msgs, "temperature": "chaud"})
    assert code == 400
    srv.shutdown()


def test_stats_exposes_decode_pool_for_continuous_llm(tmp_path):
    """When generation serves through the continuous slot pool, /stats
    carries its occupancy / prefix-cache / speculation counters (same
    data the dashboard Système section renders)."""
    from rag_dpo_tpu.app.demo import build_demo_stack
    from rag_dpo_tpu.app.server import serve
    from rag_dpo_tpu.providers.factory import create_tpu_llm
    from rag_dpo_tpu.utils.query_logger import QueryLogger

    llm = create_tpu_llm(arch="tiny", quantize_int8=False,
                         quantize_kv=True, scheduler="continuous",
                         speculative=True, max_batch=2, prefix_cache=2,
                         prefill_chunk=32)
    try:
        llm.generate("Quel est le délai de notification d'une violation ?",
                     max_tokens=6)
        pipe, ctx = build_demo_stack(llm=llm)
        system = dict(ctx)
        system["llm"] = llm
        system["pipe"] = pipe
        system["agent_pipe"] = pipe
        system["qlog"] = QueryLogger(tmp_path / "q.jsonl",
                                     tmp_path / "f.jsonl")
        srv = serve(port=0, system=system)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            with urllib.request.urlopen(url + "/stats", timeout=30) as r:
                stats = json.loads(r.read())
            dp = stats.get("decode_pool")
            assert dp is not None
            assert dp["slots"] == 2 and dp["speculative"]
            assert dp["prefix_cache"] == 2 and dp["admitted"] >= 1
            assert "mean_occupancy" in dp and "tokens" in dp
        finally:
            srv.shutdown()
    finally:
        llm._driver.close()


def test_build_system_uses_bootstrap_when_index_checkpoint_exists(
        tmp_path, monkeypatch):
    """The HTTP server serves the PRODUCTION stack (config-driven
    bootstrap: saved index, unified config incl. llm.mode / scheduler /
    RAGDPO_* overlays) whenever an index checkpoint exists — it
    previously always built the demo stack, so env-configured serving
    silently ran on demo data."""
    from rag_dpo_tpu.app.server import build_system
    from rag_dpo_tpu.ingest.indexer import CorpusIndexer
    from rag_dpo_tpu.providers import Embedder, FakeLLMProvider
    from rag_dpo_tpu.utils.paths import default_paths

    from test_retrieval import CORPUS

    monkeypatch.setenv("RAGDPO_TPU_ROOT", str(tmp_path))
    monkeypatch.setenv("RAGDPO_LLM_MODE", "fake")
    monkeypatch.setenv("RAGDPO_RETRIEVAL_USE_RERANKER", "false")
    paths = default_paths(tmp_path).ensure()
    embedder = Embedder()          # same default build_system constructs
    chunks = []
    for cid, text, meta in CORPUS:
        c = dict(meta)
        c["chunk_id"] = cid
        c["text"] = text
        chunks.append(c)
    index, _, _ = CorpusIndexer(embedder, ell_width=16).build(chunks)
    index.save(paths.index_dir)

    system = build_system(agent_too=False)
    assert system["index"].n_rows == len(CORPUS)
    assert isinstance(system["llm"], FakeLLMProvider)
    resp = system["pipe"].query("délai de notification d'une violation")
    assert resp.answer and resp.sources


def test_warm_coalesced_precompiles_all_batchers(tmp_path_factory):
    """--warm covers the coalescing batchers: after _warm_coalesced a
    production choose() adds no program, and the encode/rerank
    batchers have executed at least one coalesced device call each."""
    import os

    import jax.numpy as jnp

    from rag_dpo_tpu.app.server import _warm_coalesced
    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider
    from rag_dpo_tpu.rag.intent import CHOOSE_PROMPT, VALID_INTENTS

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("warm"))
    system = build_system(agent_too=False)
    # (the config knobs wire these through bootstrap — covered by
    # test_bootstrap; the demo fallback stack enables them directly)
    system["embedder"].enable_query_batching(max_batch=16)
    system["pipe"].reranker.enable_pair_batching(max_batch=16)
    llm = TPULLMProvider(
        DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                           dtype=jnp.float32), choose_batch=4)
    system["llm"] = llm
    _warm_coalesced(system)
    progs = set(llm.generator._programs)
    assert any(k[0] == "choose" for k in progs)
    llm.choose(CHOOSE_PROMPT.format(question="Quel délai ?"),
               list(VALID_INTENTS))
    assert set(llm.generator._programs) == progs
    assert system["embedder"]._query_batcher.stats.n_device_calls >= 1
    rr = system["pipe"].reranker
    assert rr._pair_batcher.stats.n_device_calls >= 1


def test_penalties_over_http(tmp_path_factory):
    """/generate and /v1/chat/completions accept OpenAI-style
    frequency/presence penalties on the continuous TPU provider;
    a provider without penalty support 400s instead of silently
    dropping them; validation rejects out-of-range values."""
    import os
    import threading as th

    from rag_dpo_tpu.providers.factory import create_tpu_llm

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("pen"))
    system = build_system(agent_too=False)
    llm = create_tpu_llm(arch="tiny", quantize_int8=False,
                         scheduler="continuous", max_batch=2)
    system["llm"] = llm
    system["stream_llm"] = llm
    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    code, data = _post(url, "/generate",
                       {"prompt": "Bonjour", "max_tokens": 8,
                        "frequency_penalty": 0.5,
                        "presence_penalty": 1.0})
    assert code == 200 and data["text"]
    code, data = _post(url, "/generate",
                       {"prompt": "x", "frequency_penalty": 3.0})
    assert code == 400 and "[-2, 2]" in data["error"]
    code, data = _post(url, "/v1/chat/completions",
                       {"messages": [{"role": "user",
                                      "content": "Bonjour"}],
                        "max_tokens": 8, "presence_penalty": 0.5})
    assert code == 200
    assert data["choices"][0]["message"]["content"]
    srv.shutdown()
    llm._driver.close()

    # a provider whose generate() has no penalty params: nonzero
    # penalties are rejected, never silently dropped
    from rag_dpo_tpu.app.server import _parse_penalties
    from rag_dpo_tpu.providers import FakeLLMProvider

    pens, bad = _parse_penalties({"presence_penalty": 0.5},
                                 FakeLLMProvider())
    assert bad and "support" in bad
    pens, bad = _parse_penalties({"presence_penalty": 0.0},
                                 FakeLLMProvider())
    assert not bad and pens == {}   # zero = no-op, allowed anywhere


def test_openai_multimodal_image_content(tmp_path_factory):
    """OpenAI multimodal content parts on /v1/chat/completions: a
    data:-URL image part routes through generate_with_image (on-chip
    LLaVA path); without vision attached the capability failure is a
    clean 400; malformed parts 400 with specific messages."""
    import base64
    import io
    import json as _json
    import os
    import threading as th

    import jax.numpy as jnp
    from PIL import Image

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.models.vit import ViTConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("oaiv"))
    system = build_system(agent_too=False)
    llm = TPULLMProvider(
        DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                           dtype=jnp.float32), max_new_tokens=8)
    system["stream_llm"] = llm
    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    buf = io.BytesIO()
    Image.fromarray(
        __import__("numpy").random.default_rng(0)
        .integers(0, 255, (32, 32, 3)).astype("uint8")).save(
        buf, format="PNG")
    data_url = ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode())
    msgs = [{"role": "user", "content": [
        {"type": "text", "text": "Classifie cette image."},
        {"type": "image_url", "image_url": {"url": data_url}}]}]

    # no vision attached → clean 400 (capability, not a crash)
    code, data = _post(url, "/v1/chat/completions",
                       {"messages": msgs, "max_tokens": 8})
    assert code == 400 and "vision" in str(data)

    llm.attach_vision(ViTConfig.tiny())
    code, data = _post(url, "/v1/chat/completions",
                       {"messages": msgs, "max_tokens": 8})
    assert code == 200, data
    assert data["choices"][0]["message"]["content"] is not None

    # streaming: one content chunk + [DONE]
    req = urllib.request.Request(
        url + "/v1/chat/completions",
        data=_json.dumps({"messages": msgs, "max_tokens": 8,
                          "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        body = r.read().decode()
    assert "chat.completion.chunk" in body
    assert body.rstrip().endswith("data: [DONE]")

    # text-only multimodal parts (no image) flatten to plain chat
    code, data = _post(url, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "bonjour"}]}],
        "max_tokens": 8})
    assert code == 200

    # malformed parts: remote URL, two images, unknown type, bad b64
    for bad_msgs, frag in (
        ([{"role": "user", "content": [
            {"type": "image_url",
             "image_url": {"url": "https://x/y.png"}}]}], "data:"),
        ([{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": data_url}},
            {"type": "image_url", "image_url": {"url": data_url}}]}],
         "one image"),
        ([{"role": "user", "content": [
            {"type": "audio", "x": 1}]}], "unsupported"),
        ([{"role": "user", "content": [
            {"type": "image_url",
             "image_url": {"url": "data:image/png;base64,@@"}}]}],
         "base64"),
    ):
        code, data = _post(url, "/v1/chat/completions",
                           {"messages": bad_msgs})
        assert code == 400 and frag in str(data), (frag, data)
    srv.shutdown()


def test_openai_vision_true_streaming(tmp_path_factory):
    """stream:true + image on a CONTINUOUS provider: real per-token
    SSE deltas (several content chunks) that concatenate to exactly
    the non-stream answer; penalties with image work on the pool and
    400 on a direct provider; stop sequences cut the vision stream."""
    import base64
    import io
    import json as _json
    import os
    import threading as th

    from PIL import Image

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.models.vit import ViTConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("oaivs"))
    system = build_system(agent_too=False)
    llm = TPULLMProvider(DecoderConfig.tiny(), max_new_tokens=8,
                         continuous=True, max_batch=2)
    llm.attach_vision(ViTConfig.tiny())
    system["stream_llm"] = llm
    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    buf = io.BytesIO()
    Image.fromarray(
        __import__("numpy").random.default_rng(1)
        .integers(0, 255, (32, 32, 3)).astype("uint8")).save(
        buf, format="PNG")
    data_url = ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode())
    msgs = [{"role": "user", "content": [
        {"type": "text", "text": "Décris cette image."},
        {"type": "image_url", "image_url": {"url": data_url}}]}]

    code, data = _post(url, "/v1/chat/completions",
                       {"messages": msgs, "max_tokens": 8})
    assert code == 200, data
    oneshot = data["choices"][0]["message"]["content"]

    def _stream(body):
        req = urllib.request.Request(
            url + "/v1/chat/completions",
            data=_json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            raw = r.read().decode()
        assert raw.rstrip().endswith("data: [DONE]")
        parts = []
        for line in raw.splitlines():
            if line.startswith("data: ") and line != "data: [DONE]":
                d = _json.loads(line[6:])["choices"][0]["delta"]
                if d.get("content"):
                    parts.append(d["content"])
        return parts

    parts = _stream({"messages": msgs, "max_tokens": 8,
                     "stream": True})
    assert len(parts) >= 2            # true deltas, not one blob
    assert "".join(parts) == oneshot

    # penalties + image on the pool: accepted (200, valid stream)
    pparts = _stream({"messages": msgs, "max_tokens": 8,
                      "stream": True, "presence_penalty": 0.5})
    assert isinstance("".join(pparts), str)

    # stop sequence cuts the stream
    stop_tok = oneshot.split()[1]
    sparts = _stream({"messages": msgs, "max_tokens": 8,
                      "stream": True, "stop": [stop_tok]})
    joined = "".join(sparts)
    assert stop_tok not in joined and oneshot.startswith(joined)
    srv.shutdown()
    llm._driver.close()

    # direct provider: penalties with image still a clean 400 (the
    # decode programs there don't carry them)
    dllm = TPULLMProvider(DecoderConfig.tiny(), max_new_tokens=8)
    dllm.attach_vision(ViTConfig.tiny())
    system["stream_llm"] = dllm
    srv2 = serve(port=0, system=system)
    th.Thread(target=srv2.serve_forever, daemon=True).start()
    url2 = f"http://127.0.0.1:{srv2.server_address[1]}"
    code, data = _post(url2, "/v1/chat/completions",
                       {"messages": msgs, "max_tokens": 8,
                        "presence_penalty": 0.5})
    assert code == 400 and "penalt" in str(data).lower()
    srv2.shutdown()


def test_openai_embeddings_endpoint(tmp_path_factory):
    """/v1/embeddings: OpenAI shape over the TPU BGE-M3 encoder —
    string + list inputs, float/base64 parity with the in-process
    embedder, document input_type through the corpus encoder, and
    specific 400s for malformed bodies."""
    import base64 as _b64
    import os
    import threading as th

    import numpy as _np

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("oaie"))
    system = build_system(agent_too=False)
    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    emb = system["embedder"]

    code, data = _post(url, "/v1/embeddings",
                       {"input": "Qu'est-ce qu'une AIPD ?"})
    assert code == 200, data
    assert data["object"] == "list" and len(data["data"]) == 1
    got = _np.asarray(data["data"][0]["embedding"], _np.float32)
    ref = emb.embed_queries(["Qu'est-ce qu'une AIPD ?"])[0]
    _np.testing.assert_allclose(got, ref, atol=1e-5)
    assert data["usage"]["prompt_tokens"] > 0

    texts = ["registre des traitements", "durée de conservation"]
    code, data = _post(url, "/v1/embeddings",
                       {"input": texts, "encoding_format": "base64"})
    assert code == 200
    assert [d["index"] for d in data["data"]] == [0, 1]
    refs = emb.embed_queries(texts)
    for d, r in zip(data["data"], refs):
        v = _np.frombuffer(_b64.b64decode(d["embedding"]), _np.float32)
        _np.testing.assert_allclose(v, r, atol=1e-5)

    # document input_type routes through the corpus encoder
    code, data = _post(url, "/v1/embeddings",
                       {"input": texts, "input_type": "document"})
    assert code == 200
    dref = emb.embed(texts)["dense"]
    _np.testing.assert_allclose(
        _np.asarray(data["data"][1]["embedding"], _np.float32),
        dref[1], atol=1e-5)

    for body, frag in (
        ({}, "input"),
        ({"input": []}, "input"),
        ({"input": [1, 2]}, "input"),
        ({"input": ["a"] * 257}, "max 256"),
        ({"input": "x", "encoding_format": "int8"}, "encoding_format"),
        ({"input": "x", "dimensions": 64}, "dimensions"),
        ({"input": "x", "input_type": "passage"}, "input_type"),
    ):
        code, data = _post(url, "/v1/embeddings", body)
        assert code == 400 and frag in str(data), (frag, data)

    # no embedder → 503
    sys2 = dict(system)
    sys2.pop("embedder")
    srv2 = serve(port=0, system=sys2)
    th.Thread(target=srv2.serve_forever, daemon=True).start()
    code, data = _post(
        f"http://127.0.0.1:{srv2.server_address[1]}",
        "/v1/embeddings", {"input": "x"})
    assert code == 503
    srv2.shutdown()
    srv.shutdown()


def test_openai_completions_and_n_choices(tmp_path_factory):
    """/v1/completions (legacy text endpoint): single + list prompts
    over the TPU decoder, stream deltas concatenating to the one-shot
    text, specific 400s; and `n` on /v1/chat/completions returns n
    choices (greedy → identical, seeded sampling → per-choice seeds)."""
    import json as _json
    import os
    import threading as th

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("oaic"))
    system = build_system(agent_too=False)
    llm = TPULLMProvider(DecoderConfig.tiny(), max_new_tokens=8,
                         continuous=True, max_batch=4)
    system["stream_llm"] = llm
    srv = serve(port=0, system=system)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    code, data = _post(url, "/v1/completions",
                       {"prompt": "La CNIL est", "max_tokens": 8})
    assert code == 200, data
    assert data["object"] == "text_completion"
    one = data["choices"][0]["text"]
    assert isinstance(one, str) and data["usage"]["total_tokens"] > 0

    # list of prompts → indexed choices, each equal to its solo run
    code, data = _post(url, "/v1/completions",
                       {"prompt": ["La CNIL est", "Le RGPD impose"],
                        "max_tokens": 8})
    assert code == 200
    assert [c["index"] for c in data["choices"]] == [0, 1]
    assert data["choices"][0]["text"] == one

    # stream concatenates to the one-shot text
    req = urllib.request.Request(
        url + "/v1/completions",
        data=_json.dumps({"prompt": "La CNIL est", "max_tokens": 8,
                          "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        raw = r.read().decode()
    assert raw.rstrip().endswith("data: [DONE]")
    parts = []
    for line in raw.splitlines():
        if line.startswith("data: ") and line != "data: [DONE]":
            c = _json.loads(line[6:])["choices"][0]
            if c["text"]:
                parts.append(c["text"])
    assert len(parts) >= 2 and "".join(parts) == one

    for body, frag in (
        ({}, "prompt"),
        ({"prompt": ["a"] * 9}, "max 8"),
        ({"prompt": ["a", "b"], "stream": True}, "single prompt"),
        ({"prompt": "x", "temperature": "hot"}, "temperature"),
    ):
        code, data = _post(url, "/v1/completions", body)
        assert code == 400 and frag in str(data), (frag, data)

    # n choices on chat completions
    msgs = [{"role": "user", "content": "Bonjour"}]
    code, data = _post(url, "/v1/chat/completions",
                       {"messages": msgs, "max_tokens": 8, "n": 2})
    assert code == 200, data
    assert [c["index"] for c in data["choices"]] == [0, 1]
    # greedy: both identical
    assert (data["choices"][0]["message"]["content"]
            == data["choices"][1]["message"]["content"])
    # seeded sampling: per-choice seeds -> reproducible pair
    code, d1 = _post(url, "/v1/chat/completions",
                     {"messages": msgs, "max_tokens": 8, "n": 2,
                      "temperature": 0.9, "seed": 11})
    code2, d2 = _post(url, "/v1/chat/completions",
                      {"messages": msgs, "max_tokens": 8, "n": 2,
                       "temperature": 0.9, "seed": 11})
    assert code == code2 == 200
    assert ([c["message"]["content"] for c in d1["choices"]]
            == [c["message"]["content"] for c in d2["choices"]])
    # choice 1 must equal a direct seed+1 call
    code, d3 = _post(url, "/v1/chat/completions",
                     {"messages": msgs, "max_tokens": 8,
                      "temperature": 0.9, "seed": 12})
    assert d3["choices"][0]["message"]["content"] \
        == d1["choices"][1]["message"]["content"]

    for body, frag in (
        ({"messages": msgs, "n": 0}, "[1, 8]"),
        ({"messages": msgs, "n": 9}, "[1, 8]"),
        ({"messages": msgs, "n": 2, "stream": True}, "n > 1"),
    ):
        code, data = _post(url, "/v1/chat/completions", body)
        assert code == 400 and frag in str(data), (frag, data)
    srv.shutdown()
    llm._driver.close()
