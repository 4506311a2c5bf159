"""Per-request sampling seeds + position-keyed draws.

Every decode program keys each draw on (request seed, position) —
`models/generate.py::step_keys` — instead of threading one shared rng
stream through the carry. Consequences pinned here:

* a SAMPLED request is a pure function of (prompt, params, seed):
  identical whatever shares the continuous pool, whenever it joins,
  and however the decode is chunked;
* pooled sampled output == the solo `generate_ids` run with the same
  seed (the greedy solo-parity guarantee, extended to sampling);
* recompute preemption resumes a sampled request bit-identically
  (the resumed slot re-derives the same keys at the same positions);
* co-batched identical prompts sample independent streams (advisor
  round-2, now at per-ROW granularity);
* the OpenAI `seed` parameter rides provider → driver → engine and
  POST /generate + /v1/chat/completions (400 on providers without it).

Reference parity note: the reference's Ollama backend exposes only
temperature (`/root/reference/src/utils/llm_provider.py:122-148`);
`seed` is a serving-framework superset matching the OpenAI API.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator
from rag_dpo_tpu.serving import ContinuousEngine

CFG = DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                         dtype=jnp.float32)
SAMPLING = SamplingConfig(temperature=0.0, eos_id=2, pad_id=1)


@pytest.fixture(scope="module")
def gen():
    return TextGenerator(CFG)


def _prompt(rng, n):
    return rng.integers(4, CFG.vocab_size, (n,)).astype(np.int32)


def _solo_sampled(gen, ids, max_new, temp, seed):
    out = gen.generate_ids(
        ids[None], np.asarray([len(ids)], np.int32),
        SamplingConfig(temperature=temp, eos_id=2, pad_id=1,
                       max_new_tokens=max_new),
        rng_seeds=[seed])
    toks = []
    for t in np.asarray(out)[0]:
        if t in (1, 2):
            break
        toks.append(int(t))
    return toks


# --------------------------------------------------- generator level
def test_generate_ids_seed_determinism_and_sensitivity(gen):
    rng = np.random.default_rng(0)
    ids = np.stack([_prompt(rng, 8), np.pad(_prompt(rng, 6), (0, 2),
                                            constant_values=1)])
    lens = np.asarray([8, 6], np.int32)
    s = SamplingConfig(temperature=0.9, max_new_tokens=6, eos_id=-1)
    a = gen.generate_ids(ids, lens, s, rng_seed=7)
    assert np.array_equal(a, gen.generate_ids(ids, lens, s, rng_seed=7))
    assert not np.array_equal(a, gen.generate_ids(ids, lens, s,
                                                  rng_seed=8))


def test_sampled_stream_equals_generate_ids_any_chunking(gen):
    """Position-keyed draws make chunk boundaries invisible to the
    sampled stream too (previously only greedy had this)."""
    rng = np.random.default_rng(1)
    ids = _prompt(rng, 8)[None]
    lens = np.asarray([8], np.int32)
    s = SamplingConfig(temperature=1.1, max_new_tokens=12, eos_id=-1)
    want = gen.generate_ids(ids, lens, s, rng_seeds=[77])
    for chunk in (3, 5, 12):
        got = np.concatenate(list(gen.generate_stream(
            ids, lens, s, rng_seeds=[77], chunk=chunk)), axis=1)
        assert np.array_equal(got, want), chunk


def test_row_stream_independent_of_batch_composition(gen):
    """A row's sampled stream depends only on ITS (prompt, seed) —
    not on what else rides the batch or where the row sits."""
    rng = np.random.default_rng(2)
    p = _prompt(rng, 8)
    q = _prompt(rng, 8)
    s = SamplingConfig(temperature=0.8, max_new_tokens=8, eos_id=-1)
    solo = gen.generate_ids(p[None], np.asarray([8], np.int32), s,
                            rng_seeds=[505])[0]
    batched = gen.generate_ids(
        np.stack([q, p]), np.asarray([8, 8], np.int32), s,
        rng_seeds=[99, 505])
    assert np.array_equal(solo, batched[1])


def test_cobatched_identical_prompts_sample_independently(gen):
    """Default per-row seeds: the same prompt twice in ONE batch draws
    two different generations (rng_seed alone still reproduces the
    call)."""
    rng = np.random.default_rng(3)
    p = _prompt(rng, 8)
    s = SamplingConfig(temperature=1.5, max_new_tokens=12, eos_id=-1)
    out = gen.generate_ids(np.stack([p, p]),
                           np.asarray([8, 8], np.int32), s, rng_seed=4)
    assert not np.array_equal(out[0], out[1])


# ------------------------------------------------------ engine level
def test_pool_sampled_request_is_pure_function_of_seed(gen):
    """Same (prompt, temp, seed) → same tokens, whatever shares the
    pool and whenever it joins; and it equals the solo generate_ids
    run with that seed."""
    rng = np.random.default_rng(4)
    p = _prompt(rng, 7)
    n1, n2 = _prompt(rng, 5), _prompt(rng, 10)
    eng = ContinuousEngine(gen, slots=3, sampling=SAMPLING, chunk=3)
    r_alone = eng.submit(p, len(p), 8, temperature=0.9, seed=42)
    eng.run()
    alone = eng._requests[r_alone].tokens
    # same request again, now joining mid-flight next to two neighbors
    rn1 = eng.submit(n1, len(n1), 12, temperature=1.3)
    eng.step()
    r_crowd = eng.submit(p, len(p), 8, temperature=0.9, seed=42)
    rn2 = eng.submit(n2, len(n2), 6)
    eng.run()
    assert eng._requests[r_crowd].tokens == alone
    assert alone == _solo_sampled(gen, p, 8, 0.9, 42)


def test_same_seed_reproduces_different_seed_differs(gen):
    rng = np.random.default_rng(5)
    p = _prompt(rng, 8)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=4)
    outs = []
    for seed in (7, 7, 8):
        rid = eng.submit(p, len(p), 12, temperature=1.2, seed=seed)
        eng.run()
        outs.append(tuple(eng._requests[rid].tokens))
    assert outs[0] == outs[1]
    assert outs[0] != outs[2]


def test_sampled_request_survives_preemption_bit_identically(gen):
    """Recompute preemption: the victim re-prefills prompt+emissions
    and its position-keyed draws resume exactly — sampled requests now
    share the greedy guarantee."""
    rng = np.random.default_rng(6)
    low = _prompt(rng, 8)
    # un-preempted oracle
    eng0 = ContinuousEngine(gen, slots=1, sampling=SAMPLING, chunk=2)
    r0 = eng0.submit(low, len(low), 20, temperature=0.9, seed=3131)
    want = eng0.run()[r0]
    eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING, chunk=2,
                           preemption=True)
    rl = eng.submit(low, len(low), 20, priority=2, temperature=0.9,
                    seed=3131)
    eng.step()
    eng.step()                              # low is mid-generation
    assert eng._requests[rl].slot >= 0
    high = _prompt(rng, 5)
    rh = eng.submit(high, len(high), 3, priority=0)
    eng.step()
    assert eng.stats["preempted"] == 1
    results = eng.run()
    assert len(results[rh]) <= 3
    assert results[rl] == want, (results[rl], want)


def test_spec_pool_sampled_seed_reproduces(gen):
    """Speculative sampling is seed-deterministic too: accept uniforms
    and token draws are position-keyed, so same seed → same tokens
    across runs of the same engine config."""
    rng = np.random.default_rng(7)
    p = _prompt(rng, 9)
    outs = []
    for _ in range(2):
        eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING,
                               chunk=3, speculative=True, draft_len=4,
                               adaptive=False)
        rid = eng.submit(p, len(p), 12, temperature=0.9, seed=606)
        eng.run()
        outs.append(tuple(eng._requests[rid].tokens))
    assert outs[0] == outs[1]


# ---------------------------------------------------- provider level
def test_provider_seed_reproduces_on_continuous_scheduler():
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    llm = TPULLMProvider(CFG, max_new_tokens=8, continuous=True,
                         max_batch=2)
    try:
        a = llm.generate("durée de conservation ?", temperature=0.9,
                         seed=12345)
        b = llm.generate("durée de conservation ?", temperature=0.9,
                         seed=12345)
        c = llm.generate("durée de conservation ?", temperature=0.9)
        d = llm.generate("durée de conservation ?", temperature=0.9)
        assert a.ok and a.text == b.text
        assert c.ok and d.ok and c.text != d.text  # fresh streams
        s = "".join(llm.generate_stream("durée de conservation ?",
                                        temperature=0.9, seed=12345))
        assert s == a.text
    finally:
        llm._driver.close()


def test_provider_seed_reproduces_on_direct_scheduler():
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    llm = TPULLMProvider(CFG, max_new_tokens=8)
    a = llm.generate("délai de notification ?", temperature=0.9,
                     seed=777)
    b = llm.generate("délai de notification ?", temperature=0.9,
                     seed=777)
    assert a.ok and a.text == b.text


# ------------------------------------------------------ server level
def test_parse_seed_contract():
    from rag_dpo_tpu.app.server import _parse_seed

    class WithSeed:
        def generate(self, prompt, seed=None):
            pass

    class NoSeed:
        def generate(self, prompt):
            pass

    assert _parse_seed({}, WithSeed()) == ({}, None)
    assert _parse_seed({"seed": 7}, WithSeed()) == ({"seed": 7}, None)
    _, bad = _parse_seed({"seed": "x"}, WithSeed())
    assert bad == "seed must be an integer"
    _, bad = _parse_seed({"seed": 7}, NoSeed())
    assert "does not support seed" in bad
