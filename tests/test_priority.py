"""Priority scheduling on the continuous engine
(serving/continuous.py): admission order, step-based aging, and
recompute preemption. The invariant that makes preemption safe to ship
is the same one the whole engine rests on: every request's final
tokens equal its solo run — evicted and resumed included.

Reference parity note: the reference (single Ollama endpoint,
/root/reference/src/utils/llm_provider.py) serializes requests and has
no scheduler; priority classes are beyond-reference serving capability.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator
from rag_dpo_tpu.serving import ContinuousDriver, ContinuousEngine

CFG = DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                         dtype=jnp.float32)
SAMPLING = SamplingConfig(temperature=0.0, eos_id=2, pad_id=1)


@pytest.fixture(scope="module")
def gen():
    return TextGenerator(CFG)


def _prompt(rng, n):
    return rng.integers(4, CFG.vocab_size, (n,)).astype(np.int32)


def _solo(gen, ids, max_new):
    out = gen.generate_ids(
        ids[None], np.asarray([len(ids)], np.int32),
        SamplingConfig(temperature=0.0, eos_id=2, pad_id=1,
                       max_new_tokens=max_new))[0]
    toks = []
    for t in out:
        t = int(t)
        if t in (1, 2):
            break
        toks.append(t)
    return toks


def test_priority_admission_order(gen):
    """With one slot and three queued requests, the lowest priority
    number admits first; equal priorities stay FIFO."""
    rng = np.random.default_rng(10)
    eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING, chunk=2)
    a, b, c = _prompt(rng, 6), _prompt(rng, 7), _prompt(rng, 5)
    ra = eng.submit(a, len(a), 3, priority=1)
    rb = eng.submit(b, len(b), 3, priority=1)
    rc = eng.submit(c, len(c), 3, priority=0)
    order = []
    orig = eng._activate

    def spy(slot, req, logits1, caches1):
        order.append(req.rid)
        return orig(slot, req, logits1, caches1)

    eng._activate = spy
    results = eng.run()
    assert order == [rc, ra, rb]          # priority, then FIFO
    assert results[ra] == _solo(gen, a, 3)
    assert results[rb] == _solo(gen, b, 3)
    assert results[rc] == _solo(gen, c, 3)


def test_aging_prevents_starvation(gen):
    """age_steps=1: a class-3 request waiting while a long request
    decodes outranks a fresh class-0 submitted at the same time —
    without aging the class-0 one would always win."""
    rng = np.random.default_rng(11)
    for age, expect_victim_first in ((1, True), (0, False)):
        eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING,
                               chunk=1, age_steps=age)
        order = []
        orig = eng._activate

        def spy(slot, req, logits1, caches1, _o=orig, _ord=order):
            _ord.append(req.rid)
            return _o(slot, req, logits1, caches1)

        eng._activate = spy
        blocker = _prompt(rng, 6)
        rb = eng.submit(blocker, len(blocker), 6, priority=0)
        victim = _prompt(rng, 6)
        rv = eng.submit(victim, len(victim), 2, priority=3)
        for _ in range(4):
            eng.step()          # victim waits 4 steps (= 4 age levels)
        assert not eng._requests[rb].done
        fresh = _prompt(rng, 6)
        rf = eng.submit(fresh, len(fresh), 2, priority=0)
        eng.run()
        # with age_steps=1 the victim's 4-step head start outweighs
        # its 3-class handicap; without aging class 0 always wins
        got = order.index(rv) < order.index(rf)
        assert got == expect_victim_first, (age, order)


def test_preemption_resumes_bit_identically(gen):
    """A strictly-higher-priority arrival evicts the active request;
    the victim re-queues, re-prefills prompt+emissions, and its FINAL
    tokens equal an uninterrupted solo run."""
    rng = np.random.default_rng(12)
    eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING, chunk=2,
                           preemption=True)
    low = _prompt(rng, 8)
    rl = eng.submit(low, len(low), 12, priority=2)
    eng.step()
    eng.step()                              # low is mid-generation
    assert eng._requests[rl].slot >= 0
    high = _prompt(rng, 5)
    rh = eng.submit(high, len(high), 3, priority=0)
    eng.step()                              # preempt + admit high
    assert eng.stats["preempted"] == 1
    assert eng._requests[rh].slot >= 0
    assert eng._requests[rl].slot == -1
    assert eng._requests[rl].preempt_count == 1
    results = eng.run()
    assert results[rh] == _solo(gen, high, 3)
    assert results[rl] == _solo(gen, low, 12)   # the parity that matters


def test_preempt_pin_bounds_thrash(gen):
    """max_preempt=1: a once-evicted request cannot be evicted again —
    later high-priority arrivals wait for it instead."""
    rng = np.random.default_rng(13)
    eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING, chunk=1,
                           preemption=True, max_preempt=1)
    low = _prompt(rng, 6)
    rl = eng.submit(low, len(low), 8, priority=2)
    eng.step()
    h1 = _prompt(rng, 5)
    rh1 = eng.submit(h1, len(h1), 2, priority=0)
    eng.step()                              # evicts low (count → 1)
    assert eng.stats["preempted"] == 1
    while not eng._requests[rh1].done:
        eng.step()                          # h1 runs to completion
    while eng._requests[rl].slot < 0:
        eng.step()                          # low resumes into the slot
    h2 = _prompt(rng, 5)
    rh2 = eng.submit(h2, len(h2), 2, priority=0)
    eng.step()
    assert eng.stats["preempted"] == 1      # low is pinned
    assert eng._requests[rh2].slot == -1    # h2 waits its turn
    results = eng.run()
    assert results[rl] == _solo(gen, low, 8)
    assert results[rh1] == _solo(gen, h1, 2)
    assert results[rh2] == _solo(gen, h2, 2)


def test_preemption_under_speculation(gen):
    """Eviction + resume composes with the speculative pool: the
    resumed request's history buffer/emission cap must account for the
    tokens already baked into its rebuilt prompt."""
    rng = np.random.default_rng(14)
    eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING, chunk=2,
                           preemption=True, speculative=True,
                           draft_len=4, adaptive=False)
    low = _prompt(rng, 9)
    rl = eng.submit(low, len(low), 10, priority=2)
    eng.step()
    high = _prompt(rng, 5)
    rh = eng.submit(high, len(high), 3, priority=0)
    eng.step()
    assert eng.stats["preempted"] == 1
    results = eng.run()
    assert results[rh] == _solo(gen, high, 3)
    assert results[rl] == _solo(gen, low, 10)


def test_preemption_spares_prefix_cache(gen):
    """A resumed request's rebuilt prompt ends in generated text — the
    engine must not store it as a prefix-cache entry."""
    rng = np.random.default_rng(15)
    eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING, chunk=1,
                           preemption=True, prefix_cache=4,
                           prefix_block=4)
    low = _prompt(rng, 8)
    rl = eng.submit(low, len(low), 8, priority=2)
    eng.step()
    entries_before = len(eng._pentries)
    high = _prompt(rng, 5)
    eng.submit(high, len(high), 2, priority=0)
    eng.run()
    # entries grew only by high's own prompt store, never by the
    # resumed low prompt (which is longer and would add blocks)
    assert len(eng._pentries) <= entries_before + 1
    assert eng._requests[rl].tokens == _solo(gen, low, 8)


def test_background_pipelines_mark_their_class():
    """Tagging/summaries pass priority=1 on priority-aware providers
    (the TPU continuous pool) and NOTHING elsewhere — FakeLLM/HTTP
    signatures never see the kwarg."""
    from rag_dpo_tpu.ingest.tagging import ChunkTagger
    from rag_dpo_tpu.providers import FakeLLMProvider
    from rag_dpo_tpu.providers.base import background_priority_kwargs
    from rag_dpo_tpu.providers.factory import create_tpu_llm

    assert background_priority_kwargs(FakeLLMProvider()) == {}
    llm = create_tpu_llm(arch="tiny", quantize_int8=False,
                         scheduler="continuous", max_batch=2)
    try:
        assert background_priority_kwargs(llm) == {"priority": 1}
        ChunkTagger(llm).tag_one("texte sanction amende RGPD")
        eng = llm._driver.engine
        assert [r.priority for r in eng._requests.values()] == [1]
    finally:
        llm._driver.close()
    # the fake provider path still works end-to-end (kwarg elided)
    tags = ChunkTagger(FakeLLMProvider()).tag_one("texte registre")
    assert isinstance(tags, list)


def test_driver_threads_priority_through(gen):
    """ContinuousDriver.submit/generate/generate_stream carry the
    priority to the engine request."""
    rng = np.random.default_rng(16)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=2)
    drv = ContinuousDriver(eng)
    try:
        ids = _prompt(rng, 6)
        h = drv.submit(ids, len(ids), 3, priority=4)
        h.result()
        assert eng._requests[h._ctl["rid"]].priority == 4
        toks = list(drv.generate_stream(ids, len(ids), 3, priority=2))
        assert toks == _solo(gen, ids, 3)
        assert max(r.priority for r in eng._requests.values()) == 4
        assert sorted(r.priority for r in eng._requests.values()
                      )[-2] == 2
    finally:
        drv.close()
