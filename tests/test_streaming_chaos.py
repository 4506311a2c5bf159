"""Streaming chaos: whatever a provider does mid-stream — die at any
delta position, stream nothing, stream garbage between retries — both
pipelines' `query_stream` keeps the event protocol intact: zero
exceptions to the consumer, exactly ONE final ("response", RAGResponse),
deltas only before it, and failures in-band (same ladder philosophy as
tests/test_fault_injection.py, applied to the round-3 streaming path).
"""

import pytest

from rag_dpo_tpu.app.demo import build_demo_stack

QUESTION = "Quel délai pour notifier une violation à la CNIL ?"


class ChaoticStreamLLM:
    """Wraps the demo FakeLLM; the Nth chat_stream call dies after
    `die_after` deltas (0 = before the first)."""

    def __init__(self, inner, die_call: int, die_after: int):
        self.inner = inner
        self.die_call = die_call
        self.die_after = die_after
        self.calls = 0
        self.model_name = "chaotic"

    def generate(self, *a, **kw):
        return self.inner.generate(*a, **kw)

    def chat(self, *a, **kw):
        return self.inner.chat(*a, **kw)

    def chat_stream(self, messages, temperature=0.0, max_tokens=None):
        self.calls += 1
        if self.calls == self.die_call:
            n = 0
            for delta in self.inner.chat_stream(
                    messages, temperature=temperature,
                    max_tokens=max_tokens):
                for piece in (delta[: len(delta) // 2],
                              delta[len(delta) // 2:]):
                    if n >= self.die_after:
                        raise RuntimeError(
                            f"chaos: stream died at delta {n}")
                    if piece:
                        yield piece
                        n += 1
            return
        yield from self.inner.chat_stream(
            messages, temperature=temperature, max_tokens=max_tokens)


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    import os

    os.environ["RAGDPO_TPU_ROOT"] = str(
        tmp_path_factory.mktemp("stream_chaos"))
    native, ctx = build_demo_stack(agent=False)
    agent, _ = build_demo_stack(llm=ctx["llm"], agent=True)
    return native, agent, ctx


def _drain_checked(pipe, **kw):
    events = list(pipe.query_stream(QUESTION, **kw))
    kinds = [ev for ev, _ in events]
    assert kinds.count("response") == 1, kinds
    assert kinds[-1] == "response", kinds
    for ev, _ in events[:-1]:
        assert ev in ("delta", "reset"), kinds
    return events[-1][1]


@pytest.mark.parametrize("die_call", [1, 2])
@pytest.mark.parametrize("die_after", [0, 1, 3])
def test_native_stream_survives_chaos(base, die_call, die_after):
    native, _, ctx = base
    from rag_dpo_tpu.rag.generator import Generator

    old = native.generator
    native.generator = Generator(
        ChaoticStreamLLM(ctx["llm"], die_call, die_after))
    try:
        resp = _drain_checked(native)
        # either the retry recovered a real answer or the error is
        # in-band — never an exception, never a missing response
        assert resp.answer or resp.error
    finally:
        native.generator = old


@pytest.mark.parametrize("die_after", [0, 2])
def test_agent_stream_survives_chaos(base, die_after):
    _, agent, ctx = base
    from rag_dpo_tpu.rag.generator import Generator

    comp = agent.components
    old = comp.generator
    comp.generator = Generator(ChaoticStreamLLM(ctx["llm"], 1,
                                                die_after))
    try:
        resp = _drain_checked(agent)
        assert resp.answer or resp.error
        assert resp.extras["node_trace"]
    finally:
        comp.generator = old


def test_stream_consumer_can_stop_early(base):
    """A client that disconnects after the first delta must not leave
    the pipeline wedged (the agent runs in a worker thread)."""
    native, agent, _ = base
    for pipe in (native, agent):
        gen = pipe.query_stream(QUESTION)
        for ev, val in gen:
            if ev == "delta":
                break
        gen.close()  # GeneratorExit through the pipeline
        # pipeline still serviceable afterwards
        resp = pipe.query(QUESTION)
        assert resp.answer
