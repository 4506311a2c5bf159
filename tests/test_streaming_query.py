"""End-to-end streaming of the full RAG answer (VERDICT round-2 item 5).

The reference's chat surface blocks ~39 s with zero output
(`/root/reference/pages/1_💬_Chat.py:312`). Here the full /query path
streams: RAGPipeline.query_stream and RAGAgentPipeline.query_stream
yield ("delta", str) events then one ("response", RAGResponse) whose
answer carries the post-processed (markdown-fixed, citation-renumbered)
text; the HTTP server exposes the same as SSE on /query.
"""

import json
import threading
import urllib.request

import pytest

from rag_dpo_tpu.app.demo import build_demo_stack

QUESTION = "Quel délai pour notifier une violation à la CNIL ?"


@pytest.fixture(scope="module")
def stacks(tmp_path_factory):
    import os

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("stream"))
    native, ctx = build_demo_stack(agent=False)
    agent, _ = build_demo_stack(llm=ctx["llm"], agent=True)
    return native, agent, ctx


def _drain(pipe, question=QUESTION, **kw):
    deltas, resets, resp = [], 0, None
    for ev, val in pipe.query_stream(question, **kw):
        if ev == "delta":
            assert resp is None, "delta after final response"
            deltas.append(val)
        elif ev == "reset":
            resets += 1
        elif ev == "response":
            resp = val
    return deltas, resets, resp


def test_native_stream_matches_oneshot(stacks):
    native, _, _ = stacks
    oneshot = native.query(QUESTION)
    deltas, resets, resp = _drain(native)
    assert deltas and resp is not None
    assert resp.answer == oneshot.answer
    assert [s["n"] for s in resp.sources] == \
        [s["n"] for s in oneshot.sources]
    assert resp.grounded == oneshot.grounded
    # the stream carries the RAW draft; the final answer is the
    # renumbered post-processed version of that same text
    assert resp.n_candidates == oneshot.n_candidates


def test_agent_stream_matches_oneshot(stacks):
    _, agent, _ = stacks
    oneshot = agent.query(QUESTION)
    deltas, resets, resp = _drain(agent)
    assert deltas and resp is not None
    assert resp.answer == oneshot.answer
    assert resp.intent == oneshot.intent
    assert resp.extras["node_trace"] == oneshot.extras["node_trace"]


def test_stream_no_documents_still_finalizes(stacks):
    native, _, _ = stacks
    deltas, resets, resp = _drain(
        native, question="zzz zzz zzz",
        where_filter={"nature": "INEXISTANTE"})
    assert resp is not None
    assert "aucun document" in resp.answer
    assert deltas == []


def test_stream_provider_error_degrades_in_band(stacks):
    """A provider that dies mid-stream must still yield a final
    response with the error in-band, never raise to the consumer."""
    from rag_dpo_tpu.rag.generator import Generator

    native, _, ctx = stacks

    class Exploding:
        model_name = "boom"

        def chat_stream(self, messages, temperature=0.0, max_tokens=None):
            yield "Début de réponse "
            raise RuntimeError("LLM died")

        def chat(self, messages, **kw):  # retry path also fails
            raise RuntimeError("LLM died")

    old = native.generator
    native.max_quality_retries, old_retries = 0, native.max_quality_retries
    native.generator = Generator(Exploding())
    try:
        deltas, resets, resp = _drain(native)
        assert deltas == ["Début de réponse "]
        assert resp is not None and resp.error and "LLM died" in resp.error
    finally:
        native.generator = old
        native.max_quality_retries = old_retries


def test_agent_stream_reset_on_retry(stacks):
    """When the validate node sends generation back for a retry, the
    stream emits ("reset", None) and the draft restarts."""
    _, agent, ctx = stacks

    class TwoPhase:
        """First generate call: severe ungrounded answer (3+ issues);
        retry: a clean grounded one."""

        model_name = "twophase"
        calls = 0

        def __init__(self, inner):
            self.inner = inner

        def generate(self, *a, **kw):
            return self.inner.generate(*a, **kw)

        def chat(self, messages, temperature=0.0, max_tokens=None):
            return self.inner.chat(messages, temperature=temperature,
                                   max_tokens=max_tokens)

        def chat_stream(self, messages, temperature=0.0,
                        max_tokens=None):
            is_gen = any("Contexte documentaire" in m.get("content", "")
                         for m in messages)
            if is_gen:
                TwoPhase.calls += 1
                if TwoPhase.calls == 1:
                    yield ("Selon l'article 99, l'amende est de "
                           "9 999 999 € sous 777 jours. "
                           "Je ne peux pas répondre.")
                    return
            yield from self.inner.chat_stream(
                messages, temperature=temperature, max_tokens=max_tokens)

    comp = agent.components
    old_gen = comp.generator
    from rag_dpo_tpu.rag.generator import Generator

    comp.generator = Generator(TwoPhase(old_gen.llm))
    try:
        deltas, resets, resp = _drain(agent)
        assert resets >= 1, "no reset emitted on generation retry"
        assert resp is not None and resp.retried
    finally:
        comp.generator = old_gen


def test_server_query_sse(tmp_path_factory):
    import os

    from rag_dpo_tpu.app.server import build_system, serve

    os.environ["RAGDPO_TPU_ROOT"] = str(tmp_path_factory.mktemp("ssrv"))
    system = build_system(agent_too=True)
    srv = serve(port=0, system=system)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    def post(payload):
        req = urllib.request.Request(
            url + "/query", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=120)

    # oneshot reference
    with post({"question": QUESTION}) as r:
        oneshot = json.loads(r.read())

    for agent in (False, True):
        with post({"question": QUESTION, "stream": True,
                   "agent": agent}) as r:
            assert r.headers["Content-Type"].startswith(
                "text/event-stream")
            events = []
            for line in r:
                line = line.decode().strip()
                if not line.startswith("data: "):
                    continue
                body = line[6:]
                if body == "[DONE]":
                    break
                events.append(json.loads(body))
        deltas = [e["delta"] for e in events if "delta" in e]
        finals = [e["response"] for e in events if "response" in e]
        assert deltas, f"agent={agent}: no deltas"
        assert len(finals) == 1
        assert finals[0]["answer"] == oneshot["answer"]
        assert finals[0]["query_id"]
        assert [s["n"] for s in finals[0]["sources"]] == \
            [s["n"] for s in oneshot["sources"]]
    srv.shutdown()
