"""OpenAI-style frequency/presence penalties on the continuous
scheduler (`submit(frequency_penalty=, presence_penalty=)`): logits' =
logits − freq·count − pres·1[count>0] over COMPLETION tokens (vLLM
counting semantics), with the count update riding the decode scan.
Zero penalties are a bitwise no-op, so one program serves penalized
and plain traffic. A penalized slot decodes sequentially in spec mode
(its target distribution depends on the run's own earlier tokens —
parallel draft verification would be unsound); neighbors keep
speculating.

Reference parity note: the reference's Ollama backend exposes only
temperature (`src/utils/llm_provider.py:122-148`); penalties are a
serving-framework superset matching the OpenAI API surface served at
POST /v1/chat/completions."""

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


def _solo(gen, ids, max_new):
    out = gen.generate_ids(
        ids[None], np.asarray([len(ids)], np.int32),
        SamplingConfig(temperature=0.0, eos_id=2, pad_id=1,
                       max_new_tokens=max_new))
    toks = []
    for t in np.asarray(out)[0]:
        if t in (1, 2):
            break
        toks.append(int(t))
    return toks


def test_huge_presence_penalty_forbids_repeats(gen):
    """presence_penalty large enough dominates any logit gap: every
    emitted token is distinct (greedy AND sampled rows)."""
    rng = np.random.default_rng(5)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=4)
    p1, p2 = _prompt(rng, 8), _prompt(rng, 11)
    r1 = eng.submit(p1, len(p1), 24, temperature=0.0,
                    presence_penalty=1e4)
    r2 = eng.submit(p2, len(p2), 24, temperature=0.8,
                    presence_penalty=1e4)
    results = eng.run()
    for rid in (r1, r2):
        toks = results[rid]
        assert len(toks) > 8
        assert len(set(toks)) == len(toks), (rid, toks)


def test_zero_penalties_bitwise_parity(gen):
    """freq=pres=0 must not change a single token vs the solo oracle
    (x − 0.0 ≡ x bitwise): the shared program costs nothing when
    penalties are off."""
    rng = np.random.default_rng(6)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=4)
    p = _prompt(rng, 9)
    rid = eng.submit(p, len(p), 16, frequency_penalty=0.0,
                     presence_penalty=0.0)
    results = eng.run()
    assert results[rid] == _solo(gen, p, 16)


def test_frequency_penalty_mounts_with_repetition(gen):
    """frequency (per occurrence) stacks where presence (once) does
    not: a token already emitted twice carries 2·freq. Checked through
    the program's own math on a rigged single-step comparison: run the
    same request with freq=0.5 vs pres=0.5 — the decoded streams are
    legal and the penalized paths diverge from the unpenalized one."""
    rng = np.random.default_rng(7)
    p = _prompt(rng, 10)
    base = _solo(gen, p, 20)
    outs = {}
    for name, kw in [("freq", {"frequency_penalty": 0.5}),
                     ("pres", {"presence_penalty": 0.5})]:
        eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING,
                               chunk=4)
        rid = eng.submit(p, len(p), 20, **kw)
        outs[name] = eng.run()[rid]
    # random-init logits are tightly clustered, so a 0.5 penalty must
    # bend the greedy path somewhere in 20 tokens
    assert outs["freq"] != base or outs["pres"] != base
    for toks in outs.values():
        assert all(0 <= t < CFG.vocab_size for t in toks)


def test_penalized_slot_in_spec_pool_neighbors_keep_speculating(gen):
    """Spec mode: a penalized slot decodes sequentially (n_acc=1) but
    still honors its penalty (no repeats at pres=1e4); the greedy
    unpenalized neighbor keeps bitwise parity with its solo run."""
    rng = np.random.default_rng(8)
    eng = ContinuousEngine(gen, slots=2, sampling=SAMPLING, chunk=3,
                           speculative=True, draft_len=4)
    p_n, p_p = _prompt(rng, 8), _prompt(rng, 12)
    rid_n = eng.submit(p_n, len(p_n), 16)
    rid_p = eng.submit(p_p, len(p_p), 16, temperature=0.7,
                       presence_penalty=1e4)
    results = eng.run()
    assert results[rid_n] == _solo(gen, p_n, 16)
    toks = results[rid_p]
    assert len(set(toks)) == len(toks), toks


def test_penalty_counts_survive_preemption(gen):
    """Recompute preemption rebuilds the victim's completion-token
    counts from its already-emitted tokens, so a resumed penalized
    request still never repeats."""
    rng = np.random.default_rng(9)
    eng = ContinuousEngine(gen, slots=1, sampling=SAMPLING, chunk=2,
                           preemption=True)
    low = _prompt(rng, 8)
    rl = eng.submit(low, len(low), 20, priority=2,
                    presence_penalty=1e4)
    eng.step()
    eng.step()                              # low is mid-generation
    assert eng._requests[rl].slot >= 0
    high = _prompt(rng, 5)
    rh = eng.submit(high, len(high), 3, priority=0)
    eng.step()
    assert eng.stats["preempted"] == 1
    results = eng.run()
    assert results[rh] == _solo(gen, high, 3)
    toks = results[rl]
    assert len(toks) > 10
    assert len(set(toks)) == len(toks), toks


def test_negative_penalties_gate_speculation_too(gen):
    """NEGATIVE penalties reshape the target distribution just as much
    as positive ones (review finding: the (freqs > 0) gate let them
    escape and accepted drafts followed the UNPENALIZED target). A
    greedy request with freq=-1.0 under speculation must emit exactly
    the sequential penalized chain — n_acc stays 1 for that slot."""
    rng = np.random.default_rng(10)
    p = _prompt(rng, 9)
    # sequential oracle: plain engine, same penalty
    eng_plain = ContinuousEngine(gen, slots=1, sampling=SAMPLING,
                                 chunk=4)
    rid = eng_plain.submit(p, len(p), 16, frequency_penalty=-1.0)
    want = eng_plain.run()[rid]
    # speculative engine must match it bit for bit
    eng_spec = ContinuousEngine(gen, slots=1, sampling=SAMPLING,
                                chunk=3, speculative=True, draft_len=4)
    rid = eng_spec.submit(p, len(p), 16, frequency_penalty=-1.0)
    got = eng_spec.run()[rid]
    assert got == want, (got, want)
