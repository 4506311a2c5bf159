"""Nucleus (top-p) sampling (`models/generate.py::topk_topp_sample`):
one shared draw for every decode program — direct, chunked, mixed-pool,
and the speculative verify paths.

Reference parity note: the reference samples through Ollama's defaults
(`/root/reference/src/utils/llm_provider.py:122-148` exposes only
temperature); top-p is a serving-framework superset feature.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.models.generate import (SamplingConfig, TextGenerator,
                                         topk_topp_sample)

CFG = DecoderConfig.tiny(num_heads=4, num_kv_heads=2, dtype=jnp.float32)


def _logits_peaked(b, v, peak, mass=10.0):
    """Row logits with one dominant token and near-uniform tail."""
    x = np.zeros((b, v), np.float32)
    x[:, peak] = mass
    return jnp.asarray(x)


def test_top_p_small_forces_the_peak_token():
    """With top_p below the peak's own probability mass, only the peak
    can be drawn at any temperature."""
    logits = _logits_peaked(4, 64, peak=7)
    temps = jnp.asarray([0.7, 1.0, 1.5, 2.0], jnp.float32)
    for seed in range(5):
        out = topk_topp_sample(logits, temps, jax.random.key(seed),
                               top_k=40, top_p=0.5)
        assert np.all(np.asarray(out) == 7), np.asarray(out)


def test_top_p_one_is_plain_topk_sampling():
    """top_p=1.0 must reproduce the pre-nucleus draw exactly (same rng,
    same top-k ordering)."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    temps = jnp.full((8,), 0.9, jnp.float32)
    key = jax.random.key(3)
    out = topk_topp_sample(logits, temps, key, top_k=40, top_p=1.0)
    # reference draw (the old in-program formulation)
    vals, idxs = jax.lax.top_k(logits, 40)
    choice = jax.random.categorical(key, vals / 0.9, axis=-1)
    want = jnp.take_along_axis(idxs, choice[:, None], axis=1)[:, 0]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_greedy_rows_ignore_top_p():
    logits = _logits_peaked(3, 32, peak=5)
    temps = jnp.asarray([0.0, -1.0, 0.8], jnp.float32)
    out = np.asarray(topk_topp_sample(
        logits, temps, jax.random.key(0), top_k=8, top_p=0.01))
    assert out[0] == 5 and out[1] == 5   # greedy rows: argmax


def test_first_token_always_survives_nucleus():
    """Even top_p → 0 keeps the most-likely token (the draw can never
    be empty)."""
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((6, 64)).astype(np.float32))
    temps = jnp.full((6,), 1.0, jnp.float32)
    out = np.asarray(topk_topp_sample(
        logits, temps, jax.random.key(1), top_k=16, top_p=1e-9))
    want = np.asarray(jnp.argmax(logits, -1))
    np.testing.assert_array_equal(out, want)


def test_greedy_generation_invariant_to_top_p():
    """top_p must not perturb temperature-0 decoding anywhere in the
    program family (it only gates SAMPLED rows)."""
    gen = TextGenerator(CFG)
    rng = np.random.default_rng(2)
    ids = rng.integers(4, CFG.vocab_size, (2, 12)).astype(np.int32)
    lens = np.asarray([12, 9], np.int32)
    a = gen.generate_ids(ids, lens, SamplingConfig(
        temperature=0.0, max_new_tokens=6, eos_id=-1))
    b = gen.generate_ids(ids, lens, SamplingConfig(
        temperature=0.0, max_new_tokens=6, eos_id=-1, top_p=0.3))
    np.testing.assert_array_equal(a, b)


def test_pool_sampled_rows_respect_top_p():
    """A sampled request in the continuous pool under a tiny top_p
    follows the argmax chain (nucleus collapses to the peak), while a
    greedy neighbor stays bit-exact solo — through the speculative
    verify program too."""
    from rag_dpo_tpu.serving import ContinuousEngine

    gen = TextGenerator(CFG)
    sampling = SamplingConfig(temperature=0.0, eos_id=2, pad_id=1,
                              top_p=1e-9)
    rng = np.random.default_rng(3)
    g = rng.integers(4, CFG.vocab_size, (9,)).astype(np.int32)
    s = rng.integers(4, CFG.vocab_size, (7,)).astype(np.int32)

    def solo(ids, m):
        out = gen.generate_ids(
            ids[None], np.asarray([len(ids)], np.int32),
            SamplingConfig(temperature=0.0, eos_id=2, pad_id=1,
                           max_new_tokens=m))[0]
        toks = []
        for t in out:
            if int(t) in (1, 2):
                break
            toks.append(int(t))
        return toks

    for speculative in (False, True):
        eng = ContinuousEngine(gen, slots=2, sampling=sampling, chunk=2,
                               speculative=speculative, draft_len=3,
                               ngram=2)
        rg = eng.submit(g, len(g), 6)                     # greedy
        rs = eng.submit(s, len(s), 6, temperature=1.7)    # sampled
        results = eng.run()
        assert results[rg] == solo(g, 6), speculative
        assert results[rs] == solo(s, 6), \
            f"nucleus@~0 should follow argmax (spec={speculative})"


def test_provider_top_p_plumbing():
    from rag_dpo_tpu.providers.factory import create_tpu_llm

    llm = create_tpu_llm(arch="tiny", quantize_int8=False,
                         scheduler="continuous", max_batch=2, top_p=0.9)
    try:
        assert llm.top_p == 0.9
        assert llm._driver.engine.sampling.top_p == 0.9
        r = llm.generate("Quel délai de notification ?",
                         temperature=0.8, max_tokens=6)
        assert r.error is None
    finally:
        llm._driver.close()


def _oracle_truncated_probs(logits, temp, top_k, top_p, exclude=None):
    """Numpy first-principles oracle of the sampler's distribution:
    softmax over the temperature-scaled kept set (top-k ∩ nucleus with
    the first-token guard), optionally with one token excluded from
    the kept set (the residual of speculative sampling)."""
    logits = np.asarray(logits, np.float64)
    v = logits.shape[-1]
    kk = min(top_k, v)
    order = np.argsort(-logits)[:kk]
    scaled = logits[order] / temp
    keep = np.ones(kk, bool)
    if top_p < 1.0:
        p0 = np.exp(scaled - scaled.max())
        p0 = p0 / p0.sum()
        before = np.cumsum(p0) - p0
        keep = (before < top_p) | (np.arange(kk) == 0)
    if exclude is not None:
        keep &= order != exclude
    out = np.zeros(v)
    if keep.any():
        e = np.exp(scaled[keep] - scaled[keep].max())
        out[order[keep]] = e / e.sum()
    return out


def test_truncated_token_prob_matches_oracle():
    from rag_dpo_tpu.models.generate import truncated_token_prob

    rng = np.random.default_rng(7)
    logits = rng.standard_normal((6, 64)).astype(np.float32) * 3
    temps = np.asarray([0.3, 0.7, 1.0, 1.3, 0.9, 0.5], np.float32)
    tokens = rng.integers(0, 64, (6,)).astype(np.int32)
    for top_k, top_p in [(8, 1.0), (16, 0.8), (64, 0.95)]:
        got = np.asarray(truncated_token_prob(
            jnp.asarray(logits), jnp.asarray(temps),
            jnp.asarray(tokens), top_k, top_p))
        for i in range(6):
            want = _oracle_truncated_probs(
                logits[i], float(temps[i]), top_k, top_p)[tokens[i]]
            assert abs(got[i] - want) < 1e-5, (i, got[i], want)


def test_speculative_sampling_identity_is_lossless():
    """The rejection scheme's emitted marginal equals plain sampling
    EXACTLY: p(v) == p(d)·1[v=d] + (1-p(d))·residual(v), where p is
    the truncated target distribution, d any draft token, and residual
    is the exclude-d sampler's distribution. Checked against numpy
    oracles — no sampling noise."""
    rng = np.random.default_rng(11)
    for trial in range(20):
        logits = rng.standard_normal(32).astype(np.float32) * 2.5
        temp = float(rng.uniform(0.2, 1.5))
        top_k, top_p = int(rng.choice([4, 8, 32])), \
            float(rng.choice([1.0, 0.9, 0.6]))
        p = _oracle_truncated_probs(logits, temp, top_k, top_p)
        d = int(rng.integers(0, 32))
        resid = _oracle_truncated_probs(logits, temp, top_k, top_p,
                                        exclude=d)
        pd = p[d]
        lhs = p
        onehot = np.zeros(32)
        onehot[d] = 1.0
        rhs = pd * onehot + (1 - pd) * resid
        if pd >= 1.0 - 1e-12:   # can't reject a certain token
            continue
        np.testing.assert_allclose(lhs, rhs, atol=1e-9), (trial,)


def test_exclude_masks_within_the_kept_set():
    """topk_topp_sample(exclude=d) never draws d, matches the oracle
    residual distribution, and exclude=-1 is bit-identical to no
    exclusion (the greedy/plain paths share the program)."""
    rng = np.random.default_rng(3)
    logits_np = rng.standard_normal((4, 48)).astype(np.float32) * 2
    logits = jnp.asarray(logits_np)
    temps = jnp.full((4,), 0.8, jnp.float32)
    # the per-row top token is always in the kept set: exclude IT
    # (top_p=1.0 keeps all 16 top-k entries, so the kept set minus the
    # exclusion is never empty — the guarantee is unconditional there)
    excl = np.asarray(np.argmax(logits_np, -1), np.int32)
    draws = np.stack([
        np.asarray(topk_topp_sample(logits, temps, jax.random.key(s),
                                    top_k=16, top_p=1.0,
                                    exclude=jnp.asarray(excl)))
        for s in range(512)])
    assert not np.any(draws == excl[None, :])
    # empirical vs oracle residual (row 0): total variation small
    emp = np.bincount(draws[:, 0], minlength=48) / draws.shape[0]
    want = _oracle_truncated_probs(logits_np[0], 0.8, 16, 1.0,
                                   exclude=int(excl[0]))
    assert 0.5 * np.abs(emp - want).sum() < 0.08
    # degenerate: nucleus keeps ONLY the excluded token → everything
    # masked → the draw falls back to the top token. Unreachable in
    # speculative sampling (kept set {d} means p(d)=1, which never
    # rejects) but pinned so the fallback stays deliberate.
    peaked = _logits_peaked(1, 48, peak=11)
    out = np.asarray(topk_topp_sample(
        peaked, jnp.asarray([0.8], jnp.float32), jax.random.key(1),
        top_k=16, top_p=0.5,
        exclude=jnp.asarray([11], jnp.int32)))
    assert out[0] == 11
    # exclude=-1 == no exclusion, same rng stream
    a = topk_topp_sample(logits, temps, jax.random.key(9), top_k=16,
                         top_p=0.9)
    bq = topk_topp_sample(logits, temps, jax.random.key(9), top_k=16,
                          top_p=0.9,
                          exclude=jnp.full((4,), -1, jnp.int32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(bq))
