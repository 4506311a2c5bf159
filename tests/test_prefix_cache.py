"""Automatic prefix caching in the continuous engine
(serving/continuous.py `prefix_cache=N`): reusing a cached
block-aligned K/V prefix must be OUTPUT-INVISIBLE — every request's
tokens equal its solo greedy run — while actually skipping the shared
prefix's prefill work (stats prove the reuse happened).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator
from rag_dpo_tpu.serving import ContinuousEngine

CFG = DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                         dtype=jnp.float32)
SAMPLING = SamplingConfig(temperature=0.0, eos_id=2, pad_id=1)
BLK = 8


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


def _engine(gen, **kw):
    kw.setdefault("slots", 2)
    kw.setdefault("sampling", SAMPLING)
    kw.setdefault("chunk", 2)
    kw.setdefault("prefix_cache", 4)
    kw.setdefault("prefix_block", BLK)
    return ContinuousEngine(gen, **kw)


def test_shared_prefix_hit_matches_solo(gen):
    """Second request sharing a 2-block prefix: suffix-only prefill,
    identical output."""
    rng = np.random.default_rng(0)
    shared = _prompt(rng, 2 * BLK)
    a = np.concatenate([shared, _prompt(rng, 5)])
    b = np.concatenate([shared, _prompt(rng, 9)])
    eng = _engine(gen)
    ra = eng.submit(a, len(a), 6)
    rb = eng.submit(b, len(b), 6)
    results = eng.run()
    assert results[ra] == _solo(gen, a, 6)
    assert results[rb] == _solo(gen, b, 6)
    assert eng.stats["prefix_hits"] == 1
    assert eng.stats["prefix_saved_tokens"] == 2 * BLK


def test_identical_prompt_reuses_all_but_last_partial_block(gen):
    """An identical prompt hits the longest prefix that still leaves
    ≥1 suffix token (block-aligned, < length)."""
    rng = np.random.default_rng(1)
    ids = _prompt(rng, 3 * BLK + 3)     # 27 tokens → 3 full blocks
    eng = _engine(gen)
    r1 = eng.submit(ids, len(ids), 5)
    r2 = eng.submit(ids, len(ids), 5)
    results = eng.run()
    want = _solo(gen, ids, 5)
    assert results[r1] == want and results[r2] == want
    assert eng.stats["prefix_hits"] == 1
    assert eng.stats["prefix_saved_tokens"] == 3 * BLK


def test_exact_block_multiple_prompt_leaves_one_suffix_token(gen):
    """Prompt length an exact block multiple: reuse stops one block
    short so the extend program still has a token to produce logits."""
    rng = np.random.default_rng(2)
    ids = _prompt(rng, 2 * BLK)
    eng = _engine(gen)
    r1 = eng.submit(ids, len(ids), 4)
    r2 = eng.submit(ids, len(ids), 4)
    results = eng.run()
    want = _solo(gen, ids, 4)
    assert results[r1] == want and results[r2] == want
    assert eng.stats["prefix_saved_tokens"] == BLK   # not 2*BLK


def test_partial_block_overlap_is_a_miss(gen):
    """Prefixes that diverge inside the first block never match."""
    rng = np.random.default_rng(3)
    a = _prompt(rng, BLK + 4)
    b = a.copy()
    b[2] += 1                            # diverges inside block 0
    eng = _engine(gen)
    ra = eng.submit(a, len(a), 5)
    rb = eng.submit(b, len(b), 5)
    results = eng.run()
    assert results[ra] == _solo(gen, a, 5)
    assert results[rb] == _solo(gen, b, 5)
    assert eng.stats["prefix_hits"] == 0


def test_lru_eviction_bounds_entries_and_stays_correct(gen):
    """Capacity-1 cache: the second distinct prompt evicts the first;
    a third request matching the evicted prefix misses but still
    decodes correctly."""
    rng = np.random.default_rng(4)
    a = _prompt(rng, 2 * BLK + 2)
    b = _prompt(rng, 2 * BLK + 2)
    eng = _engine(gen, prefix_cache=1)
    seq = [(a, 4), (b, 4), (a, 6)]
    rids = []
    for ids, m in seq:
        rids.append(eng.submit(ids, len(ids), m))
        eng.run()                        # serialize admissions
    for rid, (ids, m) in zip(rids, seq):
        assert eng._requests[rid].tokens == _solo(gen, ids, m)
    assert len(eng._pentries) == 1
    assert eng.stats["prefix_hits"] == 0  # b evicted a; a evicted b


def test_cached_entry_serves_shorter_prefix_of_longer_prompt(gen):
    """An entry stored from a LONG prompt serves a later request that
    matches only its first block — positions past the match are stale
    in the reused row but stay causally invisible."""
    rng = np.random.default_rng(5)
    shared = _prompt(rng, BLK)
    long = np.concatenate([shared, _prompt(rng, 2 * BLK)])
    short = np.concatenate([shared, _prompt(rng, 3)])
    eng = _engine(gen)
    rl = eng.submit(long, len(long), 5)
    eng.run()
    rs = eng.submit(short, len(short), 8)
    eng.run()
    assert eng._requests[rl].tokens == _solo(gen, long, 5)
    assert eng._requests[rs].tokens == _solo(gen, short, 8)
    assert eng.stats["prefix_hits"] == 1
    assert eng.stats["prefix_saved_tokens"] == BLK


def test_prefix_cache_composes_with_speculative(gen):
    """APC + speculative decoding together: suffix-prefilled slots
    verify drafts over the reused prefix and outputs stay lossless."""
    rng = np.random.default_rng(6)
    shared = _prompt(rng, 2 * BLK)
    reqs = [(np.concatenate([shared, _prompt(rng, n)]), m)
            for n, m in ((4, 8), (7, 6), (2, 10))]
    eng = _engine(gen, speculative=True, draft_len=4, ngram=2)
    rids = [eng.submit(ids, len(ids), m) for ids, m in reqs]
    results = eng.run()
    for rid, (ids, m) in zip(rids, reqs):
        assert results[rid] == _solo(gen, ids, m), rid
    assert eng.stats["prefix_hits"] >= 1


def test_store_on_hit_extends_the_cached_chain(gen):
    """A hit's extended row is re-stored under its LONGER chain, so a
    third request sharing the longer prefix saves more."""
    rng = np.random.default_rng(7)
    base = _prompt(rng, BLK)
    mid = np.concatenate([base, _prompt(rng, BLK)])      # 2 blocks
    longer = np.concatenate([mid, _prompt(rng, 3)])
    eng = _engine(gen)
    eng.submit(base, len(base), 4)
    eng.run()                       # miss; stores nothing reusable > 0
    r2 = eng.submit(np.concatenate([mid, _prompt(rng, 2)]),
                    len(mid) + 2, 4)
    eng.run()                       # hits base's... (base has no full
    #                                 block? base IS one full block)
    r3 = eng.submit(longer, len(longer), 4)
    eng.run()
    # r3 must reuse the 2-block chain stored by r2's admission
    assert eng.stats["prefix_saved_tokens"] >= BLK + 2 * BLK
    assert eng._requests[r3].tokens == _solo(gen, longer, 4)


def test_host_mode_entries_live_in_host_ram_and_match_device_mode(gen):
    """prefix_cache_host=True: entries are numpy trees sliced to their
    block-aligned length (host RAM, not a pinned [1, max_seq] device
    row); hits, saved tokens, and OUTPUTS are identical to device-mode
    and to solo."""
    rng = np.random.default_rng(8)
    shared = _prompt(rng, 2 * BLK)
    reqs = [(np.concatenate([shared, _prompt(rng, n)]), m)
            for n, m in ((5, 6), (9, 6), (3, 8))]

    stats = {}
    for host in (False, True):
        eng = _engine(gen, prefix_cache_host=host)
        rids = [eng.submit(ids, len(ids), m) for ids, m in reqs]
        results = eng.run()
        for rid, (ids, m) in zip(rids, reqs):
            assert results[rid] == _solo(gen, ids, m), (host, rid)
        stats[host] = (eng.stats["prefix_hits"],
                       eng.stats["prefix_saved_tokens"])
        if host:
            for entry in eng._pentries.values():
                assert "kv_host" in entry
                leaves = jax.tree.leaves(entry["kv_host"])
                assert all(isinstance(x, np.ndarray) for x in leaves)
                assert all(x.shape[1] == entry["len"] for x in leaves)
    assert stats[True] == stats[False] and stats[True][0] >= 2, stats


def test_host_mode_composes_with_chunked_prefill_and_speculation(gen):
    """Host-resident entries ride the segmented-prefill admission path
    (placer upload → suffix extends) under speculation, losslessly."""
    rng = np.random.default_rng(9)
    shared = _prompt(rng, 2 * BLK)
    a = np.concatenate([shared, _prompt(rng, 7)])
    b = np.concatenate([shared, _prompt(rng, 12)])
    eng = _engine(gen, prefix_cache_host=True, prefill_chunk=BLK,
                  speculative=True, draft_len=3, ngram=2)
    ra = eng.submit(a, len(a), 8)
    eng.run()
    rb = eng.submit(b, len(b), 8)
    eng.run()
    assert eng._requests[ra].tokens == _solo(gen, a, 8)
    assert eng._requests[rb].tokens == _solo(gen, b, 8)
    assert eng.stats["prefix_hits"] == 1
    assert eng.stats["prefix_saved_tokens"] == 2 * BLK


def test_provider_prefix_cache_serves_shared_system_prompt():
    """TPULLMProvider(continuous=True, prefix_cache=N): repeated calls
    with the same system prompt reuse its K/V and answers match the
    direct provider."""
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    direct = TPULLMProvider(CFG, max_new_tokens=6)
    apc = TPULLMProvider(CFG, max_new_tokens=6, continuous=True,
                         max_batch=2, prefix_cache=4, prefix_block=8)
    apc.generator._params = direct.generator.load()
    system = ("Tu es un assistant juridique spécialisé dans le RGPD "
              "et la protection des données personnelles en France.")
    for q in ("Quelle est la base légale ?",
              "Quel est le délai de notification ?",
              "Qui contrôle la conformité ?"):
        want = direct.generate(q, system=system, temperature=0.0)
        got = apc.generate(q, system=system, temperature=0.0)
        assert got.error is None and want.error is None
        assert got.text == want.text, q
    assert apc._driver.engine.stats["prefix_hits"] >= 2
    assert apc._driver.engine.stats["prefix_saved_tokens"] > 0
    apc._driver.close()


def test_device_entries_are_bucket_sliced_not_full_rows(gen):
    """Device-mode entries hold [1, bucket, ...] slices (a full
    [1, max_seq] row pins ~2x-30x the HBM an entry needs; at 12B a row
    is ~246 MB) and hits replay through the device placer with outputs
    equal to solo."""
    rng = np.random.default_rng(11)
    shared = _prompt(rng, 2 * BLK)
    a = np.concatenate([shared, _prompt(rng, 5)])
    b = np.concatenate([shared, _prompt(rng, 9)])
    eng = _engine(gen)
    ra = eng.submit(a, len(a), 6)
    rb = eng.submit(b, len(b), 6)
    results = eng.run()
    assert results[ra] == _solo(gen, a, 6)
    assert results[rb] == _solo(gen, b, 6)
    assert eng.stats["prefix_hits"] == 1
    for entry in eng._pentries.values():
        assert "kv_dev" in entry and entry["sb"] < CFG.max_seq_len
        for leaf in jax.tree.leaves(entry["kv_dev"]):
            assert leaf.shape[1] == entry["sb"]
