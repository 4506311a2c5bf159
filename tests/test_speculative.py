"""Prompt-lookup speculative decoding (models/speculative.py).

Greedy speculative decoding is LOSSLESS by construction: whatever the
drafts contain, the accepted stream must be bit-identical to the plain
`generate_ids` greedy loop — same tokens, same EOS cut, same pad fill.
These tests assert that exhaustively, plus that acceptance actually
multiplies tokens/step on self-repeating output (the mechanism that
pays off on real RAG answers quoting their context).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator
from rag_dpo_tpu.models.speculative import SpeculativeGenerator

CFG = DecoderConfig.tiny(num_heads=4, num_kv_heads=2, dtype=jnp.float32)


@pytest.fixture(scope="module")
def gen():
    g = TextGenerator(CFG)
    g.load()
    return g


def _sampling(max_new, eos=2):
    return SamplingConfig(temperature=0.0, max_new_tokens=max_new,
                          eos_id=eos, pad_id=1)


def _prompts(rng, shape):
    return rng.integers(4, CFG.vocab_size, shape).astype(np.int32)


@pytest.mark.parametrize("draft_len,ngram", [(4, 2), (7, 2), (3, 3)])
def test_bit_parity_with_plain_greedy(gen, draft_len, ngram):
    rng = np.random.default_rng(0)
    ids = _prompts(rng, (3, 12))
    lengths = np.asarray([12, 7, 4], np.int32)
    sampling = _sampling(24)
    plain = gen.generate_ids(ids, lengths, sampling)
    spec = SpeculativeGenerator(gen, draft_len=draft_len, ngram=ngram)
    out, stats = spec.generate_ids(ids, lengths, sampling)
    np.testing.assert_array_equal(out, plain)
    assert stats.tokens >= 3  # every live row emitted something


def test_bit_parity_including_eos_and_pad_tail(gen):
    """Pick an eos that actually fires mid-stream, then require the
    speculative output to reproduce the EOS position AND the pad tail."""
    rng = np.random.default_rng(1)
    ids = _prompts(rng, (2, 10))
    lengths = np.asarray([10, 6], np.int32)
    probe = gen.generate_ids(ids, lengths, _sampling(20))
    eos = int(probe[0, 4])  # token the model emits at step 5 of row 0
    sampling = _sampling(20, eos=eos)
    plain = gen.generate_ids(ids, lengths, sampling)
    assert np.any(plain == eos)
    spec = SpeculativeGenerator(gen, draft_len=5, ngram=2)
    out, _ = spec.generate_ids(ids, lengths, sampling)
    np.testing.assert_array_equal(out, plain)


def test_parity_over_many_seeds(gen):
    """Sweep prompts: drafts vary wildly (hits, misses, pad drafts,
    overlapping repeats) — output must always equal plain greedy."""
    spec = SpeculativeGenerator(gen, draft_len=6, ngram=2)
    sampling = _sampling(16)
    for seed in range(6):
        rng = np.random.default_rng(seed)
        ids = _prompts(rng, (2, 8))
        lengths = np.asarray([8, 8], np.int32)
        plain = gen.generate_ids(ids, lengths, sampling)
        out, _ = spec.generate_ids(ids, lengths, sampling)
        np.testing.assert_array_equal(out, plain, err_msg=f"seed {seed}")


def test_oracle_drafts_reach_full_acceptance(gen):
    """Inject the model's own greedy continuation as the draft source
    (acceptance upper bound — what real weights approach when the
    answer quotes retrieved context): every draft verifies, so the
    whole generation completes in ~max_new/(1+draft_len) steps, and the
    output is STILL bit-identical."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    ids = _prompts(rng, (2, 8))
    lengths = np.asarray([8, 8], np.int32)
    max_new, k = 32, 7
    sampling = _sampling(max_new)
    plain = gen.generate_ids(ids, lengths, sampling)

    oracle = jnp.asarray(plain, jnp.int32)  # [B, max_new]

    def oracle_draft(ids_buf, cur):
        # n_emit of the pending step = cur - prompt_len - 1 (t1 already
        # counted); drafts are the next k plain tokens after t1
        n_emit = cur - jnp.asarray(lengths) - 1
        src = n_emit[:, None] + 1 + jnp.arange(k)[None, :]
        return jnp.take_along_axis(
            oracle, jnp.clip(src, 0, max_new - 1), axis=1)

    spec = SpeculativeGenerator(gen, draft_len=k, draft_fn=oracle_draft)
    out, stats = spec.generate_ids(ids, lengths, sampling)
    np.testing.assert_array_equal(out, plain)
    assert stats.tokens_per_step >= (1 + k) * 0.8, stats
    assert stats.steps <= -(-max_new // (1 + k)) + 1, stats


def test_lookup_draft_finds_latest_occurrence(gen):
    """Unit check of the prompt-lookup itself: the draft equals the
    tokens that followed the LATEST earlier occurrence of the tail
    2-gram, and pads when the 2-gram never occurred."""
    import jax.numpy as jnp

    spec = SpeculativeGenerator(gen, draft_len=4, ngram=2)
    #        0   1   2   3   4   5   6   7   8   9  10  11
    buf = [[10, 20, 31, 32, 33, 10, 20, 41, 42, 10, 20, 0],
           [10, 20, 31, 32, 33, 34, 35, 36, 37, 50, 60, 0]]
    ids_buf = jnp.asarray(np.asarray(buf, np.int32))
    cur = jnp.asarray([11, 11], jnp.int32)  # tails: [10,20], [50,60]
    drafts = np.asarray(spec.lookup_draft(ids_buf, cur))
    # row 0: latest earlier "10 20" starts at 5 → following: 41 42 10 20
    np.testing.assert_array_equal(drafts[0], [41, 42, 10, 20])
    # row 1: "50 60" never occurred before → pad drafts
    np.testing.assert_array_equal(drafts[1], [1, 1, 1, 1])


def test_provider_speculative_matches_plain():
    """TPULLMProvider(speculative=True): the served greedy answer is
    identical to the plain provider's (same config/seeded params), and
    SpecStats accumulate for observability."""
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    plain_p = TPULLMProvider(CFG, max_new_tokens=12)
    spec_p = TPULLMProvider(CFG, max_new_tokens=12, speculative=True,
                            draft_len=4)
    prompt = "Quelles sont les obligations du responsable de traitement ?"
    a = plain_p.generate(prompt, temperature=0.0)
    b = spec_p.generate(prompt, temperature=0.0)
    assert a.error is None and b.error is None, (a.error, b.error)
    assert a.text == b.text
    assert spec_p.spec_stats["calls"] == 1
    assert spec_p.spec_stats["tokens"] >= 1
    # sampled calls bypass the speculative engine (falls through to the
    # plain sampled decode) without error
    c = spec_p.generate(prompt, temperature=0.7)
    assert c.error is None


def test_sampling_falls_back_to_plain(gen):
    rng = np.random.default_rng(3)
    ids = _prompts(rng, (1, 6))
    lengths = np.asarray([6], np.int32)
    sampling = SamplingConfig(temperature=0.8, max_new_tokens=8,
                              eos_id=2, pad_id=1)
    spec = SpeculativeGenerator(gen)
    out, _ = spec.generate_ids(ids, lengths, sampling)
    plain = gen.generate_ids(ids, lengths, sampling)
    np.testing.assert_array_equal(out, plain)


def test_bit_parity_under_int8_kv_cache(gen):
    """Speculative verify over a QUANTIZED cache still equals the plain
    quantized greedy decode bit-for-bit (the int8 cache is the single
    source of truth, so verify and decode attend the same K/V)."""
    import dataclasses

    qcfg = dataclasses.replace(CFG, quantize_kv=True)
    gq = TextGenerator(qcfg, params=gen.load())
    rng = np.random.default_rng(21)
    ids = _prompts(rng, (3, 12))
    lengths = np.asarray([12, 9, 5], np.int32)
    sampling = _sampling(16)
    plain = gq.generate_ids(ids, lengths, sampling)
    spec = SpeculativeGenerator(gq, draft_len=4, ngram=2)
    out, stats = spec.generate_ids(ids, lengths, sampling)
    np.testing.assert_array_equal(out, plain)
    assert stats.tokens >= 3
