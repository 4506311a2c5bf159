"""Continuous batching engine (serving/continuous.py): step-level
admission into a fixed slot pool must be OUTPUT-INVISIBLE — every
request's tokens equal its solo `generate_ids` run, whatever joins the
pool, whenever it joins, and however often its slot was reused.
"""

import jax.numpy as jnp
import numpy as np
import pytest

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


def test_engine_matches_solo_generation(gen):
    rng = np.random.default_rng(0)
    eng = ContinuousEngine(gen, slots=4, sampling=SAMPLING, chunk=4)
    reqs = [(_prompt(rng, n), m) for n, m in
            ((6, 8), (11, 5), (3, 12), (9, 7))]
    rids = [eng.submit(ids, len(ids), m) for ids, m in reqs]
    results = eng.run()
    for rid, (ids, m) in zip(rids, reqs):
        assert results[rid] == _solo(gen, ids, m), rid


def test_late_join_and_slot_reuse(gen):
    """More requests than slots, one joining mid-flight: the pool
    recycles slots and every output still matches solo."""
    rng = np.random.default_rng(1)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=2)
    a = _prompt(rng, 8)
    b = _prompt(rng, 5)
    c = _prompt(rng, 12)
    ra = eng.submit(a, len(a), 10)
    rb = eng.submit(b, len(b), 3)   # finishes early → slot frees
    eng.step()
    eng.step()                       # b likely done by now
    rc = eng.submit(c, len(c), 6)   # joins mid-flight
    results = eng.run()
    assert results[ra] == _solo(gen, a, 10)
    assert results[rb] == _solo(gen, b, 3)
    assert results[rc] == _solo(gen, c, 6)
    assert eng.stats["admitted"] == 3
    # with 2 slots and 3 requests, some step ran at full occupancy
    assert eng.occupancy > 1.0


def test_budget_frees_slot_immediately(gen):
    rng = np.random.default_rng(2)
    eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING, chunk=4)
    a = _prompt(rng, 6)
    b = _prompt(rng, 6)
    ra = eng.submit(a, len(a), 2)   # tiny budget
    rb = eng.submit(b, len(b), 2)
    results = eng.run()
    assert len(results[ra]) <= 2 and len(results[rb]) <= 2
    assert results[ra] == _solo(gen, a, 2)
    assert results[rb] == _solo(gen, b, 2)


def test_streaming_callback_fires_per_token(gen):
    rng = np.random.default_rng(3)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=2)
    seen = []
    ids = _prompt(rng, 7)
    rid = eng.submit(ids, len(ids), 5,
                     on_token=lambda r, t: seen.append((r, t)))
    results = eng.run()
    assert [t for r, t in seen if r == rid] == results[rid]


def test_prompt_bucketing_bounds_prefill_programs():
    fresh = TextGenerator(CFG)
    rng = np.random.default_rng(4)
    eng = ContinuousEngine(fresh, slots=2, sampling=SAMPLING, chunk=2)
    for n in (3, 7, 19, 30):         # all bucket to 32
        eng.submit(_prompt(rng, n), n, 2)
    eng.run()
    prefill_keys = {k for k in fresh._programs if k[0] == "prefill"}
    # one probe (1, 8) + one bucketed (1, 32) — nothing per raw length
    assert prefill_keys == {("prefill", 1, 8), ("prefill", 1, 32)}


def test_driver_concurrent_callers_match_single_stream():
    """16 threads through the ContinuousDriver (4 slots): every answer
    equals the single-stream greedy output."""
    import threading

    from rag_dpo_tpu.serving.continuous import ContinuousDriver

    fresh = TextGenerator(CFG)
    eng = ContinuousEngine(fresh, slots=4, sampling=SAMPLING, chunk=2)
    driver = ContinuousDriver(eng)
    rng = np.random.default_rng(7)
    jobs = [(_prompt(rng, 5 + i % 7), 4 + i % 5) for i in range(16)]
    out = {}

    def call(i):
        ids, m = jobs[i]
        out[i] = driver.generate(ids, len(ids), m)

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    driver.close()
    for i, (ids, m) in enumerate(jobs):
        assert out[i] == _solo(fresh, ids, m), i


def test_provider_continuous_mode():
    """TPULLMProvider(continuous=True): greedy chat answers match the
    direct path; concurrent calls share the slot pool."""
    import threading

    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    direct = TPULLMProvider(CFG, max_new_tokens=6)
    cont = TPULLMProvider(CFG, max_new_tokens=6, continuous=True,
                          max_batch=4)
    cont.generator._params = direct.generator.load()  # same weights

    prompts = [f"question numéro {i} sur le RGPD" for i in range(6)]
    want = [direct.generate(p).text for p in prompts]
    got = {}

    def call(i):
        got[i] = cont.generate(prompts[i]).text

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    cont._driver.close()
    for i in range(6):
        assert got[i] == want[i], (i, got[i], want[i])


def test_driver_stream_matches_blocking(gen):
    """generate_stream through the driver yields the SAME token ids as
    the blocking path, with concurrent streams sharing the pool."""
    import threading

    from rag_dpo_tpu.serving.continuous import ContinuousDriver

    fresh = TextGenerator(CFG)
    eng = ContinuousEngine(fresh, slots=2, sampling=SAMPLING, chunk=2)
    driver = ContinuousDriver(eng)
    rng = np.random.default_rng(11)
    jobs = [(_prompt(rng, 4 + i), 5 + i) for i in range(4)]
    out = {}

    def call(i):
        ids, m = jobs[i]
        out[i] = list(driver.generate_stream(ids, len(ids), m))

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    driver.close()
    for i, (ids, m) in enumerate(jobs):
        assert out[i] == _solo(fresh, ids, m), i


def test_mixed_pool_greedy_rows_unaffected_by_sampled_neighbors(gen):
    """Per-request temperature: a greedy request sharing the pool with
    sampled neighbors still matches its solo greedy run exactly."""
    rng = np.random.default_rng(31)
    eng = ContinuousEngine(gen, slots=4, sampling=SAMPLING, chunk=3)
    g1, g2 = _prompt(rng, 7), _prompt(rng, 11)
    s1, s2 = _prompt(rng, 5), _prompt(rng, 9)
    rg1 = eng.submit(g1, len(g1), 8)                 # engine default 0
    rs1 = eng.submit(s1, len(s1), 8, temperature=0.9)
    rg2 = eng.submit(g2, len(g2), 6, temperature=0.0)
    rs2 = eng.submit(s2, len(s2), 6, temperature=1.3)
    results = eng.run()
    assert results[rg1] == _solo(gen, g1, 8)
    assert results[rg2] == _solo(gen, g2, 6)
    assert len(results[rs1]) <= 8 and len(results[rs2]) <= 6
    for t in results[rs1] + results[rs2]:
        assert 0 <= t < CFG.vocab_size


def test_sampled_requests_are_independent_across_submissions(gen):
    """The same prompt sampled twice draws from an advancing rng —
    outputs must not replay (advisor round-2 independence, now at the
    pool level)."""
    rng = np.random.default_rng(32)
    ids = _prompt(rng, 8)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=4)
    outs = []
    for _ in range(4):
        rid = eng.submit(ids, len(ids), 12, temperature=1.5)
        eng.run()
        outs.append(tuple(eng._requests[rid].tokens))
    assert len(set(outs)) > 1, outs


def test_sampled_rows_ride_the_speculative_pool(gen):
    """speculative=True with a sampled request: the sampled slot draws
    in-program and advances one token per verify; greedy neighbors keep
    their lossless guarantee."""
    rng = np.random.default_rng(33)
    g = _prompt(rng, 10)
    s = _prompt(rng, 6)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING,
                           speculative=True, draft_len=4, ngram=2)
    rg = eng.submit(g, len(g), 9)
    rs = eng.submit(s, len(s), 7, temperature=0.8)
    results = eng.run()
    assert results[rg] == _solo(gen, g, 9)
    assert len(results[rs]) <= 7
    for t in results[rs]:
        assert 0 <= t < CFG.vocab_size


def test_provider_sampled_calls_ride_the_pool():
    """TPULLMProvider(continuous=True): sampled calls now join the slot
    pool instead of falling through to the direct path."""
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    cont = TPULLMProvider(CFG, max_new_tokens=6, continuous=True,
                          max_batch=2)
    before = cont._driver.engine.stats["admitted"]
    r = cont.generate("durée de conservation ?", temperature=0.9)
    assert r.error is None
    s = "".join(cont.generate_stream("base légale ?", temperature=0.7))
    assert isinstance(s, str)
    assert cont._driver.engine.stats["admitted"] == before + 2
    cont._driver.close()


def test_speculative_engine_matches_solo(gen):
    """speculative=True composes prompt-lookup drafts with the slot
    pool: every request's tokens must STILL equal its solo greedy run
    (lossless), whatever its neighbors decode."""
    rng = np.random.default_rng(21)
    eng = ContinuousEngine(gen, slots=4, sampling=SAMPLING,
                           speculative=True, draft_len=5, ngram=2)
    reqs = [(_prompt(rng, n), m) for n, m in
            ((6, 10), (11, 7), (3, 14), (9, 5))]
    rids = [eng.submit(ids, len(ids), m) for ids, m in reqs]
    results = eng.run()
    for rid, (ids, m) in zip(rids, reqs):
        assert results[rid] == _solo(gen, ids, m), rid


def test_speculative_slot_reuse_matches_solo(gen):
    """Slot recycling under speculation: a late joiner inherits a slot
    whose K/V holds the previous occupant's stale rows PLUS rejected
    verify writes past the old pointer — the overwrite-on-insert and
    causal mask must still isolate it."""
    rng = np.random.default_rng(22)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING,
                           speculative=True, draft_len=4, ngram=2)
    a, b, c = _prompt(rng, 8), _prompt(rng, 5), _prompt(rng, 12)
    ra = eng.submit(a, len(a), 10)
    rb = eng.submit(b, len(b), 3)
    eng.step()
    eng.step()
    rc = eng.submit(c, len(c), 6)    # reuses b's slot mid-flight
    results = eng.run()
    assert results[ra] == _solo(gen, a, 10)
    assert results[rb] == _solo(gen, b, 3)
    assert results[rc] == _solo(gen, c, 6)


def test_speculative_pool_acceleration_with_oracle_drafts(gen):
    """Feed each slot its own solo continuation as the draft via the
    public draft_fn hook (the acceptance upper bound real RAG answers
    approach when quoting context): the pool finishes BOTH requests in
    ~max_new/(1+K) steps and outputs stay bit-identical."""
    from rag_dpo_tpu.serving.continuous import _lookup_draft_np

    rng = np.random.default_rng(23)
    prompts = [_prompt(rng, 6), _prompt(rng, 9)]
    max_new, k = 24, 5
    raw = [np.asarray(gen.generate_ids(
        p[None], np.asarray([len(p)], np.int32),
        SamplingConfig(temperature=0.0, eos_id=2, pad_id=1,
                       max_new_tokens=max_new))[0], np.int32)
        for p in prompts]

    def oracle(hist, kk, n, pad):
        for p, s in zip(prompts, raw):
            if len(hist) > len(p) and np.array_equal(hist[:len(p)], p):
                m = len(hist) - len(p)   # emitted incl. the t1 anchor
                out = np.full((kk,), pad, np.int32)
                src = s[m:m + kk]
                out[:len(src)] = src
                return out
        return _lookup_draft_np(hist, kk, n, pad)

    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING,
                           speculative=True, draft_len=k, ngram=2,
                           draft_fn=oracle)
    rids = [eng.submit(p, len(p), max_new) for p in prompts]
    results = eng.run()
    for rid, p in zip(rids, prompts):
        assert results[rid] == _solo(gen, p, max_new), rid
    # both slots decode concurrently; full acceptance compresses the
    # whole run into ~max_new/(1+K) pool steps
    assert eng.stats["steps"] <= -(-max_new // (1 + k)) + 2, eng.stats


def test_device_oracle_drafts_compress_dispatches(gen):
    """device_draft_fn (traceable, in-program): feeding each slot its
    own solo continuation through a position-aligned table drives full
    acceptance — the whole run completes in ~max_new/(chunk·(1+K))
    dispatches and outputs stay bit-identical."""
    import jax.numpy as jnp

    rng = np.random.default_rng(25)
    prompts = [_prompt(rng, 6), _prompt(rng, 9)]
    max_new, k, chunk = 24, 5, 2
    L = CFG.max_seq_len
    tab = np.ones((2, L), np.int32)
    for r, p in enumerate(prompts):
        raw = np.asarray(gen.generate_ids(
            p[None], np.asarray([len(p)], np.int32),
            SamplingConfig(temperature=0.0, eos_id=2, pad_id=1,
                           max_new_tokens=max_new))[0], np.int32)
        tab[r, :len(p)] = p
        tab[r, len(p):len(p) + max_new] = raw
    keys = jnp.asarray(np.stack([p[:4] for p in prompts]))
    table = jnp.asarray(tab)

    def oracle(ids_buf, cur):
        m = jnp.all(ids_buf[:, None, :4] == keys[None], -1)
        r = jnp.argmax(m, axis=1)
        src = cur[:, None] + jnp.arange(k)[None, :]
        return jnp.take_along_axis(
            table[r], jnp.clip(src, 0, L - 1), axis=1)

    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING,
                           chunk=chunk, speculative=True, draft_len=k,
                           device_draft_fn=oracle)
    rids = [eng.submit(p, len(p), max_new) for p in prompts]
    results = eng.run()
    for rid, p in zip(rids, prompts):
        assert results[rid] == _solo(gen, p, max_new), rid
    # full acceptance: chunk·(1+K)=12 tokens per dispatch → 24 tokens
    # need 2 dispatches (plus one admission dispatch tolerance)
    assert eng.stats["steps"] <= 3, eng.stats
    # adaptive is on by default: high acceptance keeps speculation live
    assert eng.stats["plain_dispatches"] == 0, eng.stats


def test_adaptive_fallback_on_low_acceptance(gen):
    """Never-accepting device drafts (constant pad, acceptance ≈ 1):
    the adaptive engine abandons speculation after the probe window and
    decodes the rest on the plain chunked program — outputs stay
    bit-identical through the switch."""
    rng = np.random.default_rng(31)
    prompts = [_prompt(rng, 7), _prompt(rng, 5)]
    max_new, k = 24, 4
    bad = lambda buf, cur: jnp.ones((buf.shape[0], k), jnp.int32)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=2,
                           speculative=True, draft_len=k,
                           device_draft_fn=bad,
                           adaptive=True, spec_probe=2, spec_hold=4)
    rids = [eng.submit(p, len(p), max_new) for p in prompts]
    results = eng.run()
    for rid, p in zip(rids, prompts):
        assert results[rid] == _solo(gen, p, max_new), rid
    assert eng.stats["plain_dispatches"] > 0, eng.stats
    assert eng.stats["spec_dispatches"] >= 2, eng.stats


def test_adaptive_oscillation_is_lossless(gen):
    """Force mode churn (breakeven no acceptance can clear, hold 1,
    probe 1): the engine alternates speculative and plain dispatches,
    resyncing the device token-history buffer at every re-entry — the
    output must stay bit-identical through every switch, including a
    late-joining request admitted mid-churn."""
    rng = np.random.default_rng(32)
    a, b, c = _prompt(rng, 8), _prompt(rng, 5), _prompt(rng, 6)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=2,
                           speculative=True, draft_len=3, ngram=2,
                           adaptive=True, spec_breakeven=1e9,
                           spec_probe=1, spec_hold=1, spec_hold_max=1)
    ra = eng.submit(a, len(a), 20)
    rb = eng.submit(b, len(b), 6)
    while eng.stats["steps"] < 3:
        eng.step()
    rc = eng.submit(c, len(c), 12)   # joins mid-churn
    results = eng.run()
    assert results[ra] == _solo(gen, a, 20)
    assert results[rb] == _solo(gen, b, 6)
    assert results[rc] == _solo(gen, c, 12)
    assert eng.stats["plain_dispatches"] > 1, eng.stats
    assert eng.stats["spec_dispatches"] > 1, eng.stats


def test_chunked_prefill_matches_solo(gen):
    """prefill_chunk: long prompts prefill in bounded segments across
    steps; outputs stay bit-identical to the solo run."""
    rng = np.random.default_rng(40)
    prompts = [_prompt(rng, 13), _prompt(rng, 6), _prompt(rng, 9)]
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=2,
                           prefill_chunk=4)
    rids = [eng.submit(p, len(p), 10) for p in prompts]
    results = eng.run()
    for rid, p in zip(rids, prompts):
        assert results[rid] == _solo(gen, p, 10), rid
    # 13 → 4 segments, 6 → 2, 9 → 3
    assert eng.stats["prefill_segments"] == 9, eng.stats


def test_chunked_prefill_interleaves_decode(gen):
    """A neighbor keeps emitting tokens WHILE a long prompt prefills:
    the long admission costs it at most one segment per step, never a
    whole-prompt stall."""
    rng = np.random.default_rng(41)
    short, long_ = _prompt(rng, 4), _prompt(rng, 16)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=1,
                           prefill_chunk=4)
    ra = eng.submit(short, len(short), 12)
    eng.step()                        # short active, decoding
    rb = eng.submit(long_, len(long_), 6)
    interleaved = 0
    while rb not in [r.rid for r in eng._active.values()] \
            and eng.busy:
        if eng.step() > 0 and eng._prefilling:
            interleaved += 1
    results = eng.run()
    assert results[ra] == _solo(gen, short, 12)
    assert results[rb] == _solo(gen, long_, 6)
    assert interleaved >= 2, interleaved


def test_chunked_prefill_composes_with_prefix_cache(gen):
    """A second long prompt sharing a cached block-aligned prefix skips
    those blocks entirely — fewer prefill segments, same tokens."""
    rng = np.random.default_rng(42)
    base = _prompt(rng, 12)
    other = np.concatenate([base[:8], _prompt(rng, 4)])
    eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING, chunk=2,
                           prefill_chunk=4, prefix_cache=4,
                           prefix_block=4)
    ra = eng.submit(base, len(base), 6)
    eng.run()
    segs_first = eng.stats["prefill_segments"]
    rb = eng.submit(other, len(other), 6)
    results = eng.run()
    assert results[ra] == _solo(gen, base, 6)
    assert results[rb] == _solo(gen, other, 6)
    assert eng.stats["prefix_hits"] == 1, eng.stats
    # 8 of 12 tokens came from the cache → one 4-token segment left
    assert eng.stats["prefill_segments"] == segs_first + 1, eng.stats


def test_engine_with_tp_sharded_params_matches_solo(gen):
    """The serving engine is TP-transparent: hand it a TextGenerator
    whose params are sharded over a model axis (models/sharding.py
    Megatron rules) and every jitted program — prefill, insert, chunked
    decode, release — runs sharded under propagation, with outputs
    bit-identical to the single-device pool. This is the multichip
    serving claim: the same engine drives a TP=2 mesh unchanged."""
    import jax

    from rag_dpo_tpu.models.generate import TextGenerator
    from rag_dpo_tpu.models.sharding import shard_params
    from rag_dpo_tpu.parallel.mesh import MeshSpec, create_mesh

    mesh = create_mesh(MeshSpec(data=1, model=2, shard=1),
                       devices=jax.devices()[:2])
    gen_tp = TextGenerator(CFG, params=shard_params(gen.load(), mesh))
    rng = np.random.default_rng(50)
    prompts = [_prompt(rng, 9), _prompt(rng, 5), _prompt(rng, 12)]
    eng = ContinuousEngine(gen_tp, slots=2, sampling=SAMPLING, chunk=3)
    rids = [eng.submit(p, len(p), 8) for p in prompts]
    results = eng.run()
    for rid, p in zip(rids, prompts):
        assert results[rid] == _solo(gen, p, 8), rid


def test_chunked_prefill_rides_the_speculative_pool(gen):
    """prefill_chunk composes with speculation: activation inserts the
    token history buffer, drafts see the full prompt."""
    rng = np.random.default_rng(43)
    prompts = [_prompt(rng, 11), _prompt(rng, 7)]
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=2,
                           prefill_chunk=4, speculative=True,
                           draft_len=3, ngram=2)
    rids = [eng.submit(p, len(p), 10) for p in prompts]
    results = eng.run()
    for rid, p in zip(rids, prompts):
        assert results[rid] == _solo(gen, p, 10), rid


def test_speculative_eos_cut_matches_solo(gen):
    """Pick an eos the model actually emits mid-stream: the speculative
    pool must cut at the same position as the solo run even when the
    eos arrives inside an accepted draft run."""
    rng = np.random.default_rng(24)
    ids = _prompt(rng, 10)
    probe = gen.generate_ids(
        ids[None], np.asarray([len(ids)], np.int32),
        SamplingConfig(temperature=0.0, eos_id=2, pad_id=1,
                       max_new_tokens=20))[0]
    eos = int(probe[4])              # fires at step 5 of the solo run
    sampling = SamplingConfig(temperature=0.0, eos_id=eos, pad_id=1)
    eng = ContinuousEngine(gen, slots=2, sampling=sampling,
                           speculative=True, draft_len=6, ngram=2)
    rid = eng.submit(ids, len(ids), 20)
    results = eng.run()
    want = []
    for t in probe:
        t = int(t)
        if t in (1, eos):
            break
        want.append(t)
    assert results[rid] == want


def test_provider_continuous_speculative_matches_direct():
    """TPULLMProvider(continuous=True, speculative=True): the slot-pool
    engine carries the speculation; greedy answers and streams match
    the direct provider bit-for-bit."""
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    direct = TPULLMProvider(CFG, max_new_tokens=8)
    spec = TPULLMProvider(CFG, max_new_tokens=8, continuous=True,
                          speculative=True, draft_len=4, max_batch=2)
    spec.generator._params = direct.generator.load()  # same weights
    assert spec._driver.engine.speculative
    for p in ("durée de conservation des données",
              "durée de conservation des données",  # lookup-friendly
              "base légale du traitement RH"):
        want = direct.generate(p, temperature=0.0)
        got = spec.generate(p, temperature=0.0)
        assert got.error is None and want.error is None
        assert got.text == want.text, p
        assert "".join(spec.generate_stream(p, temperature=0.0)) \
            == want.text, p
    spec._driver.close()


def test_provider_stream_rides_continuous_pool():
    """TPULLMProvider(continuous=True).generate_stream concatenates to
    the blocking continuous answer (greedy), and sampled streams fall
    through to the plain path without error."""
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    cont = TPULLMProvider(CFG, max_new_tokens=6, continuous=True,
                          max_batch=2)
    p = "question sur le transfert de données hors UE"
    want = cont.generate(p, temperature=0.0).text
    got = "".join(cont.generate_stream(p, temperature=0.0))
    assert got == want
    sampled = "".join(cont.generate_stream(p, temperature=0.9))
    assert isinstance(sampled, str)
    cont._driver.close()


def test_driver_step_failure_fails_callers_instead_of_hanging():
    """A device program dying mid-step must fail every in-flight
    caller's wait (with the original exception) — not strand them on
    evt.wait() forever."""
    import threading

    from rag_dpo_tpu.serving.continuous import ContinuousDriver

    fresh = TextGenerator(CFG)
    eng = ContinuousEngine(fresh, slots=2, sampling=SAMPLING, chunk=2)

    calls = {"n": 0}
    orig_step = eng.step

    def dying_step():
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("device wedged")
        return orig_step()

    eng.step = dying_step
    driver = ContinuousDriver(eng)
    rng = np.random.default_rng(9)
    errors = []

    def call():
        try:
            driver.generate(_prompt(rng, 9), 9, 8)
        except RuntimeError as e:
            errors.append(str(e))

    threads = [threading.Thread(target=call) for _ in range(3)]
    [t.start() for t in threads]
    for t in threads:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in threads), \
        "callers hung after step failure"
    assert errors and all("device wedged" in e for e in errors)
    driver.close()


def test_driver_bad_request_fails_only_its_caller():
    """engine.submit raising (oversized prompt) fails that caller; the
    pool keeps serving others."""
    from rag_dpo_tpu.serving.continuous import ContinuousDriver

    fresh = TextGenerator(CFG)
    eng = ContinuousEngine(fresh, slots=2, sampling=SAMPLING, chunk=2)
    driver = ContinuousDriver(eng)
    rng = np.random.default_rng(10)
    ids = _prompt(rng, 9)
    good = driver.generate(ids, 9, 4)
    try:
        driver.generate(_prompt(rng, CFG.max_seq_len + 50),
                        CFG.max_seq_len + 50, 4)
        raised = False
    except Exception:
        raised = True
    assert raised, "oversized prompt should fail its caller"
    assert driver.generate(ids, 9, 4) == good
    driver.close()


def test_factory_decode_chunk_reaches_engine():
    from rag_dpo_tpu.providers.factory import create_tpu_llm

    llm = create_tpu_llm(arch="tiny", quantize_int8=False,
                         scheduler="continuous", max_batch=2,
                         decode_chunk=8)
    try:
        assert llm._driver.engine.chunk == 8
        r = llm.generate("Quel délai de notification ?", max_tokens=6)
        assert r.error is None
    finally:
        llm._driver.close()


def test_engine_warm_precompiles_and_leaves_no_trace():
    """warm() compiles prefill/extend buckets and both decode dispatch
    programs, then restores stats / prefix cache / adaptive posture —
    and later real requests still match solo exactly."""
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    llm = TPULLMProvider(CFG, max_new_tokens=6, continuous=True,
                         max_batch=2, speculative=True, prefix_cache=4,
                         prefix_block=8, prefill_chunk=16)
    direct = TPULLMProvider(CFG, max_new_tokens=6)
    llm.generator._params = direct.generator.load()
    eng = llm._driver.engine
    llm.warm_decoder(prompt_buckets=(16, 32))
    progs = set(llm.generator._programs)
    assert any(k[0] == "prefill" for k in progs)
    assert any(k[0] == "decode_chunk_mixed" for k in progs)
    assert eng.stats["admitted"] == 0, "warm must not pollute stats"
    assert not eng._pentries and not eng._phash
    assert eng._spec_mode and eng._accept_ema is None
    p = "Quelle est la base légale du traitement ?"
    assert llm.generate(p, temperature=0.0).text == \
        direct.generate(p, temperature=0.0).text
    n_before = len(llm.generator._programs)
    llm.generate(p, temperature=0.0)
    assert len(llm.generator._programs) == n_before, \
        "a warmed repeat request should compile nothing new"
    llm._driver.close()


def test_raising_on_token_fails_only_its_request(gen):
    """A raising streaming callback must fail ITS caller and free its
    slot — not poison every future step (review finding)."""
    from rag_dpo_tpu.serving.continuous import ContinuousDriver

    fresh = TextGenerator(CFG)
    eng = ContinuousEngine(fresh, slots=2, sampling=SAMPLING, chunk=2)
    driver = ContinuousDriver(eng)
    rng = np.random.default_rng(13)
    ids = _prompt(rng, 9)

    def bad_cb(rid, tok):
        raise ValueError("boom in callback")

    try:
        driver.generate(ids, 9, 6, on_token=bad_cb)
        raised = False
    except ValueError:
        raised = True
    assert raised
    # the pool keeps serving; no zombie slot remains
    assert driver.generate(ids, 9, 4) == _solo(fresh, ids, 4)
    assert not eng._active
    driver.close()


def test_close_fails_pending_and_inflight_callers():
    """close() must never strand a blocked caller on evt.wait()."""
    import threading
    import time as _t

    from rag_dpo_tpu.serving.continuous import ContinuousDriver

    fresh = TextGenerator(CFG)
    eng = ContinuousEngine(fresh, slots=1, sampling=SAMPLING, chunk=2)
    driver = ContinuousDriver(eng)
    rng = np.random.default_rng(14)
    errors, ok = [], []

    def call():
        try:
            ok.append(driver.generate(_prompt(rng, 7), 7, 50))
        except RuntimeError as e:
            errors.append(str(e))

    threads = [threading.Thread(target=call) for _ in range(3)]
    [t.start() for t in threads]
    _t.sleep(0.3)           # let at least one request get in flight
    driver.close()
    for t in threads:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in threads), "caller stranded"
    assert len(ok) + len(errors) == 3
    assert all("closed" in e for e in errors)


def test_driver_warm_runs_on_driver_thread_and_pool_still_serves(gen):
    from rag_dpo_tpu.serving.continuous import ContinuousDriver

    fresh = TextGenerator(CFG)
    eng = ContinuousEngine(fresh, slots=2, sampling=SAMPLING, chunk=2,
                           speculative=True, draft_len=3, ngram=2,
                           prefix_cache=2, prefix_block=8)
    driver = ContinuousDriver(eng)
    driver.warm(prompt_buckets=(16, 32))
    assert eng.stats["admitted"] == 0 and not eng._pentries
    assert eng._hold_len == eng.spec_hold
    rng = np.random.default_rng(15)
    ids = _prompt(rng, 9)
    assert driver.generate(ids, 9, 5) == _solo(fresh, ids, 5)
    driver.close()


# ------------------------------------------------------- cancellation
def test_cancel_active_frees_slot_and_neighbor_unaffected(gen):
    """Cancelling a mid-decode request frees its slot immediately (a
    queued request admits into it) and its pool neighbor's output is
    bit-identical to solo."""
    rng = np.random.default_rng(20)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=2)
    a = _prompt(rng, 6)     # the victim: long budget
    b = _prompt(rng, 9)     # the neighbor
    c = _prompt(rng, 5)     # queued behind the full pool
    ra = eng.submit(a, len(a), 40)
    rb = eng.submit(b, len(b), 6)
    rc = eng.submit(c, len(c), 4)
    eng.step()
    eng.step()
    partial = list(eng.result(ra).tokens)
    assert eng.cancel(ra) is True
    assert eng.result(ra).done
    assert eng.result(ra).tokens == partial      # nothing emitted after
    assert ra not in {r.rid for r in eng._active.values()}
    results = eng.run()
    assert results[rb] == _solo(gen, b, 6)
    assert results[rc] == _solo(gen, c, 4)       # admitted into a's slot
    assert eng.stats["cancelled"] == 1
    assert eng.cancel(ra) is False               # already done → no-op


def test_cancel_queued_request_never_admits(gen):
    rng = np.random.default_rng(21)
    eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING, chunk=2)
    a = _prompt(rng, 6)
    b = _prompt(rng, 7)
    ra = eng.submit(a, len(a), 5)
    rb = eng.submit(b, len(b), 5)
    eng.step()                                   # a active, b queued
    assert eng.cancel(rb) is True
    results = eng.run()
    assert results[ra] == _solo(gen, a, 5)
    assert results[rb] == []
    assert eng.stats["admitted"] == 1            # b never took a slot


def test_cancel_during_chunked_prefill(gen):
    """A request cancelled while its prompt is still prefilling in
    segments stops cleanly; the slot serves the next request."""
    rng = np.random.default_rng(22)
    eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING, chunk=2,
                           prefill_chunk=4)
    a = _prompt(rng, 14)                         # 4 segments
    b = _prompt(rng, 6)
    ra = eng.submit(a, len(a), 5)
    eng.step()                                   # first segment only
    assert eng._prefilling
    assert eng.cancel(ra) is True
    assert not eng._prefilling
    rb = eng.submit(b, len(b), 4)
    results = eng.run()
    assert results[ra] == []
    assert results[rb] == _solo(gen, b, 4)


def test_cancel_under_speculation_slot_reuse_clean(gen):
    """Cancel an active slot in speculative mode: the stale _limits /
    ids_buf rows must not leak into the slot's next occupant."""
    rng = np.random.default_rng(23)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=2,
                           speculative=True, draft_len=3, ngram=2)
    a = _prompt(rng, 8)
    b = _prompt(rng, 10)
    c = _prompt(rng, 7)
    ra = eng.submit(a, len(a), 30)
    rb = eng.submit(b, len(b), 8)
    eng.step()
    assert eng.cancel(ra) is True
    rc = eng.submit(c, len(c), 6)                # reuses a's slot
    results = eng.run()
    assert results[rb] == _solo(gen, b, 8)
    assert results[rc] == _solo(gen, c, 6)
    assert results[ra] == eng.result(ra).tokens


def test_driver_handle_cancel_returns_partial():
    """driver.submit() → handle.cancel(): the caller unblocks with the
    tokens emitted so far, the pool keeps serving others."""
    import threading

    from rag_dpo_tpu.serving.continuous import ContinuousDriver

    import time as _time

    fresh = TextGenerator(CFG)
    eng = ContinuousEngine(fresh, slots=2, sampling=SAMPLING, chunk=2)
    # throttle so the victim is still decoding when the cancel lands
    orig_step = eng.step
    eng.step = lambda: (_time.sleep(0.05), orig_step())[1]
    driver = ContinuousDriver(eng)
    rng = np.random.default_rng(24)
    long_ids = _prompt(rng, 8)
    other = _prompt(rng, 6)

    started = threading.Event()
    h = driver.submit(long_ids, len(long_ids), 60,
                      on_token=lambda r, t: started.set())
    assert started.wait(timeout=30), "no token within 30s"
    assert h.cancel() is True
    partial = h.result()
    assert h.cancelled() and h.done()
    solo = _solo(fresh, long_ids, 60)
    assert 0 < len(partial) < len(solo)
    assert partial == solo[:len(partial)]        # prefix of the greedy run
    assert h.cancel() is False                   # idempotent after done
    # pool unaffected
    assert driver.generate(other, len(other), 5) == _solo(fresh, other, 5)
    assert eng.stats["cancelled"] == 1
    driver.close()


def test_stream_close_cancels_request():
    """Abandoning generate_stream (the SSE client-disconnect path)
    cancels the request instead of decoding to max_new into nowhere."""
    import time as _time

    from rag_dpo_tpu.serving.continuous import ContinuousDriver

    fresh = TextGenerator(CFG)
    eng = ContinuousEngine(fresh, slots=2, sampling=SAMPLING, chunk=2)
    # throttle decoding so the request is still in flight at close()
    # (the tiny CPU model would otherwise finish all 60 tokens first)
    orig_step = eng.step
    eng.step = lambda: (_time.sleep(0.05), orig_step())[1]
    driver = ContinuousDriver(eng)
    rng = np.random.default_rng(25)
    ids = _prompt(rng, 7)
    solo = _solo(fresh, ids, 60)   # compile solo program BEFORE the
    # stream starts — its multi-second jit between next() and close()
    # would let the throttled request finish first
    stream = driver.generate_stream(ids, len(ids), 60)
    got = [next(stream) for _ in range(2)]
    assert got == solo[:2]
    stream.close()                               # client went away
    deadline = _time.time() + 30
    while eng.stats["cancelled"] == 0 and _time.time() < deadline:
        _time.sleep(0.01)
    assert eng.stats["cancelled"] == 1
    # exhausted/completed streams must NOT cancel on close
    full = list(driver.generate_stream(ids, len(ids), 4))
    assert full == _solo(fresh, ids, 4)
    assert eng.stats["cancelled"] == 1
    driver.close()


def test_provider_stream_close_cancels_continuous_request():
    """Closing TPULLMProvider.generate_stream mid-flight propagates the
    cancel down to the slot pool."""
    import time as _time

    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    cont = TPULLMProvider(CFG, max_new_tokens=64, continuous=True,
                          max_batch=2)
    eng0 = cont._driver.engine
    orig_step = eng0.step
    eng0.step = lambda: (_time.sleep(0.05), orig_step())[1]
    stream = cont.generate_stream("durée de conservation des données",
                                  temperature=0.0)
    first = next(stream)
    assert isinstance(first, str) and first
    stream.close()
    eng = cont._driver.engine
    deadline = _time.time() + 30
    while eng.stats["cancelled"] == 0 and _time.time() < deadline:
        _time.sleep(0.01)
    assert eng.stats["cancelled"] == 1
    # provider still serves after the abort
    resp = cont.generate("base légale du traitement", temperature=0.0)
    assert resp.error is None and resp.text
    cont._driver.close()


def test_spec_sampling_accepts_drafts_near_deterministic(gen):
    """Speculative SAMPLING (temps > 0 accept drafts with prob p(d)):
    at temperature 1e-4 the truncated target is a near point mass, so
    an oracle feeding each slot its greedy continuation drives full
    acceptance — the sampled run emits exactly the greedy chain in the
    same compressed dispatch count as the greedy oracle test. Before
    speculative sampling, sampled slots pinned n_acc=1 and this run
    took ~max_new/chunk dispatches."""
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    prompts = [_prompt(rng, 6), _prompt(rng, 9)]
    max_new, k, chunk = 24, 5, 2
    L = CFG.max_seq_len
    tab = np.ones((2, L), np.int32)
    for r, p in enumerate(prompts):
        raw = np.asarray(gen.generate_ids(
            p[None], np.asarray([len(p)], np.int32),
            SamplingConfig(temperature=0.0, eos_id=2, pad_id=1,
                           max_new_tokens=max_new))[0], np.int32)
        tab[r, :len(p)] = p
        tab[r, len(p):len(p) + max_new] = raw
    keys = jnp.asarray(np.stack([p[:4] for p in prompts]))
    table = jnp.asarray(tab)

    def oracle(ids_buf, cur):
        m = jnp.all(ids_buf[:, None, :4] == keys[None], -1)
        r = jnp.argmax(m, axis=1)
        src = cur[:, None] + jnp.arange(k)[None, :]
        return jnp.take_along_axis(
            table[r], jnp.clip(src, 0, L - 1), axis=1)

    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING,
                           chunk=chunk, speculative=True, draft_len=k,
                           device_draft_fn=oracle)
    rids = [eng.submit(p, len(p), max_new, temperature=1e-4)
            for p in prompts]
    results = eng.run()
    for rid, p in zip(rids, prompts):
        assert results[rid] == _solo(gen, p, max_new), rid
    assert eng.stats["steps"] <= 3, eng.stats


def test_spec_sampling_mixed_pool_keeps_greedy_parity(gen):
    """A sampled slot next to a greedy slot: the greedy slot stays
    bit-identical to its solo run (argmax never consumes rng), the
    sampled slot completes with in-vocab tokens, and the engine's
    exclusion state resets once the pool drains."""
    rng = np.random.default_rng(33)
    p_g, p_s = _prompt(rng, 8), _prompt(rng, 12)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING,
                           chunk=3, speculative=True, draft_len=4)
    rid_g = eng.submit(p_g, len(p_g), 16, temperature=0.0)
    rid_s = eng.submit(p_s, len(p_s), 16, temperature=0.9)
    results = eng.run()
    assert results[rid_g] == _solo(gen, p_g, 16)
    assert len(results[rid_s]) > 0
    assert all(0 <= t < CFG.vocab_size for t in results[rid_s])
