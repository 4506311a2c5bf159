"""Continuous batching for the TPU-served decoder.

The micro-batched decode path (providers/tpu_llm.py) groups requests
that ARRIVE together; a group then decodes in lockstep, so one long
generation holds the whole batch and late arrivals wait for the next
group. Modern inference engines instead admit requests at step
granularity into a fixed pool of decode SLOTS — this module is that
engine, built TPU-natively on static shapes:

* the KV cache is ONE pre-allocated [slots, max_seq, ...] tree; a slot
  is the unit of admission;
* prefill runs per request at batch 1 (its own jit program) and the
  resulting single-row cache/logits are scattered into the pool with a
  jitted `dynamic_update_index_in_dim` over the carry tree — no
  recompilation, slot index is a traced scalar; with `prefill_chunk=N`
  a longer prompt prefills in bounded N-token segments, one per engine
  step, so the pool keeps decoding between segments (chunked prefill —
  a long RAG context can't stall neighbors beyond one segment);
* decode advances ALL slots together through the same chunked scan
  program the streaming path uses (`TextGenerator._decode_chunk`);
  free slots ride along masked `done` (they emit pad into nowhere);
* completion is per-slot: EOS or the request's own token budget frees
  the slot immediately and the next queued request joins at the next
  chunk boundary — a short answer never waits for a long neighbor.

Correctness guarantees (tests/test_continuous.py, test_seeds.py): a
request's output is identical to its solo `generate_ids` run
regardless of when it joins, what shares the pool, or how often its
slot was reused — for greedy AND sampled requests. Cache isolation
comes from the overwrite-on-insert plus the causal mask
(`key_pos <= q_pos` hides any stale rows beyond the new occupant's
length); sampling isolation comes from position-keyed draws (every
draw is keyed by the request's own seed and position —
models/generate.py `step_keys` — no shared rng stream exists).

`prefix_cache=N` adds automatic prefix caching (the vLLM APC idea,
static-shape TPU form): admissions store their prompt's block-aligned
K/V prefix in an N-entry LRU keyed by token bytes; a later request
sharing that prefix skips straight to a suffix-only `_extend` prefill.
Causal K/V at position i depends only on tokens ≤ i, so shared-prefix
rows are exactly reusable; RAG serving shares the per-intent system
prompt across every request, multi-turn chat shares the whole history.

Sampling is per request: each submit may carry its own temperature
(≤0 = greedy) and its own `seed` (OpenAI `seed` semantics — same
prompt + params + seed reproduces the same generation exactly) — the
decode program takes per-row temperature and seed vectors, so greedy
and sampled requests share the pool. top_k / eos / pad stay static per
engine, and prompts bucket to `prompt_buckets` lengths so the program
count stays bounded.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import time as _time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import DecoderModel
from ..models.generate import (SamplingConfig, TextGenerator,
                               apply_penalties, mix_seed,
                               sampling_logprobs,
                               penalized_rows, step_keys,
                               topk_topp_sample)


@dataclasses.dataclass
class _Request:
    rid: int
    ids: np.ndarray          # [S] bucketed prompt
    length: int
    max_new: int
    temperature: float = 0.0  # per-request; ≤0 decodes greedily
    frequency_penalty: float = 0.0   # OpenAI-style, completion tokens
    presence_penalty: float = 0.0    # (vLLM counting semantics)
    seed: int = 0             # sampling seed: draws are position-keyed
    #                           off this (models/generate.py step_keys),
    #                           so a sampled request is a pure function
    #                           of (prompt, params, seed) — independent
    #                           of pool neighbors, join time, and
    #                           preemption
    tokens: list[int] = dataclasses.field(default_factory=list)
    slot: int = -1
    done: bool = False
    on_token: Callable | None = None
    error: Exception | None = None   # per-request failure (bad callback)
    priority: int = 0        # lower admits first (0 = interactive)
    submit_step: int = 0     # engine step count at submit (aging clock)
    preempt_count: int = 0   # recompute-preemptions suffered so far
    consumed: int = 0        # leading tokens already baked into `ids`
    #                          by a preemption resume (ids holds
    #                          prompt + tokens[:consumed])
    logit_bias: Any = None   # {token_id: additive logit bias} — static
    #                          per request, rebuilt on every admission
    want_logprobs: Any = None  # None=off; 0..LOGPROB_TOPK = number of
    #                            top alternatives to keep per token
    logprobs: list = dataclasses.field(default_factory=list)
    #                          per emitted token: (lp, [(id, lp)...])
    embeds: Any = None       # [S, H] prefix embeddings (multimodal
    #                          submit_embeds): prefill runs the embeds
    #                          program, ids is a pad placeholder; the
    #                          request skips the prefix cache (image
    #                          prefixes don't key by tokens) and is
    #                          never preempted (recompute resume would
    #                          need the embeds re-spliced mid-history)


def _lookup_draft_np(hist: np.ndarray, k: int, n: int,
                     pad: int) -> np.ndarray:
    """Host-side prompt lookup (models/speculative.py semantics): the k
    tokens that followed the LATEST strictly-earlier occurrence of the
    tail n-gram of `hist`, padded when absent or truncated."""
    out = np.full((k,), pad, np.int32)
    L = len(hist)
    nw = L - n  # windows strictly before the tail n-gram itself
    if nw <= 0:
        return out
    windows = np.lib.stride_tricks.sliding_window_view(hist, n)[:nw]
    match = np.all(windows == hist[-n:], axis=1)
    if not match.any():
        return out
    j = int(np.nonzero(match)[0].max())
    src = hist[j + n:j + n + k]
    out[:len(src)] = src
    return out


_WARM = object()   # ContinuousDriver queue sentinel: run engine.warm


class _EmbedsPrompt:
    """Driver queue wrapper marking a multimodal submission: the
    payload routes to `engine.submit_embeds` instead of `submit`."""

    __slots__ = ("embeds",)

    def __init__(self, embeds):
        self.embeds = embeds

# default warm ladder: shared by engine.warm / driver.warm /
# TPULLMProvider.warm_decoder; 1024 covers long RAG contexts so the
# first 4k-char context doesn't pay a first-shape compile
WARM_BUCKETS = (64, 128, 256, 512, 1024)


class ContinuousEngine:
    """Step-level continuous batching over a fixed slot pool.

    Sampling is PER REQUEST: `submit(..., temperature=t)` decodes that
    slot greedily (t ≤ 0) or top-k-sampled at its own temperature — the
    pool mixes both in one program (`_decode_chunk_mixed`; top_k/eos/
    pad stay engine-static). The engine's SamplingConfig temperature is
    only the default for requests that don't pass one.

    `speculative=True` composes prompt-lookup speculative decoding with
    the pool (the vLLM-style pairing, TPU-native): each step drafts
    per-slot on the host from the slot's own prompt+emission history,
    runs ONE jitted (1+draft_len)-position cached verify forward over
    ALL slots, and harvests each slot's accepted run — so a slot
    quoting its context emits several tokens per weight sweep while its
    neighbors still emit their one. Greedy slots are lossless for the
    same reason the batch path is (models/speculative.py): emitted
    tokens are always the verify forward's own argmax chain. SAMPLED
    slots use speculative SAMPLING on the scanned device path
    (production default): each draft d is accepted with probability
    p(d) under the target's truncated top-k/top-p distribution (the
    prompt-lookup draft is a deterministic point mass, so Leviathan's
    min(1, p/q) reduces to p), and the first rejection's token is
    EXCLUDED from the next draw — the residual — making the emitted
    marginal exactly the plain-sampling distribution (identity test in
    tests/test_sampling.py; the RAG default temperature 0.1 therefore
    speculates too). The exclusion crosses dispatch boundaries
    (`_excl`); it is dropped on preemption and on adaptive fallback to
    plain decode — one draw then samples from full p instead of the
    residual, a bias bounded by p(d_rej) at those rare boundaries. The
    host-drafted fallback path (`draft_fn=`) stays greedy-only: its
    sampled slots draw in-program from the carried logits, drafts
    ignored, advance 1.

    `adaptive=True` (default) makes speculation self-tuning: the engine
    tracks accepted tokens per slot-step and drops back to the plain
    chunked program whenever the EMA sits under `spec_breakeven` (the
    measured verify-vs-decode step-cost ratio), re-probing with
    exponential backoff — so a workload that never quotes its context
    pays only the occasional probe instead of a steady verify tax."""

    def __init__(self, generator: TextGenerator, *, slots: int = 8,
                 sampling: SamplingConfig | None = None,
                 chunk: int = 4, rng_seed: int = 0,
                 speculative: bool = False, draft_len: int = 7,
                 ngram: int = 2, draft_fn: Callable | None = None,
                 device_draft_fn: Callable | None = None,
                 prefix_cache: int = 0, prefix_block: int = 64,
                 prefix_cache_host: bool = False,
                 adaptive: bool = True, spec_breakeven: float = 1.7,
                 spec_hold: int = 16, spec_probe: int = 2,
                 spec_hold_max: int = 256, prefill_chunk: int = 0,
                 age_steps: int = 0, preemption: bool = False,
                 max_preempt: int = 2):
        self.gen = generator
        self.cfg = generator.config
        self.slots = int(slots)
        self.sampling = sampling or SamplingConfig()
        self.chunk = int(chunk)
        self.speculative = bool(speculative)
        self.draft_len = int(draft_len)
        self.ngram = int(ngram)
        # draft_fn(hist [L] int32, k, ngram, pad) -> [k] int32 overrides
        # the prompt lookup HOST-side (forces the step-per-dispatch
        # path); device_draft_fn(ids_buf [slots, L], cur [slots]) ->
        # [slots, k] must be jax-traceable and swaps the in-program
        # draft source of the scanned path (mirrors
        # SpeculativeGenerator.draft_fn) — benches use these to measure
        # acceptance ceilings; any draft source is lossless under the
        # greedy verify
        self._draft_fn = draft_fn
        self._device_draft_fn = device_draft_fn
        self._params = generator.load()
        self._rid = itertools.count()
        self._queue: list[_Request] = []
        self._active: dict[int, _Request] = {}   # slot → request
        self._requests: dict[int, _Request] = {}  # rid → request (all)
        self.stats = {"steps": 0, "tokens": 0, "admitted": 0,
                      "occupancy_sum": 0, "prefix_hits": 0,
                      "prefix_saved_tokens": 0,
                      "spec_dispatches": 0, "plain_dispatches": 0,
                      "prefill_segments": 0, "cancelled": 0,
                      "preempted": 0}
        # priority scheduling: admission picks the queued request with
        # the lowest (effective priority, rid) — rid is arrival order,
        # so equal priorities stay FIFO. `age_steps=N` ages a waiting
        # request one priority level per N engine steps (starvation
        # bound: a class-k request outranks fresh class-0 traffic after
        # k*N steps of waiting). `preemption=True` additionally lets a
        # strictly-higher-priority queued request evict the worst
        # active slot (recompute preemption, vLLM-style: the victim
        # re-queues and later re-prefills prompt+emissions — greedy
        # decoding resumes bit-identically). `max_preempt` pins a
        # request after that many evictions so priority floods can't
        # thrash one victim forever.
        self.age_steps = int(age_steps)
        self.preemption = bool(preemption)
        self.max_preempt = int(max_preempt)
        # chunked prefill (vLLM-style, static-shape TPU form): a prompt
        # longer than `prefill_chunk` tokens prefills in bounded
        # segments — one `_extend` dispatch per engine step — while the
        # rest of the pool keeps decoding between segments, so a long
        # RAG context (8k tokens) can't stall its neighbors' token
        # streams for more than one segment's latency. 0 = whole-prompt
        # prefill at admission (the round-3 behavior).
        self.prefill_chunk = int(prefill_chunk)
        self._prefilling: dict[int, dict] = {}   # slot → prefill state
        # automatic prefix cache (vLLM-style APC, static shapes): LRU of
        # single-row K/V trees keyed by block-aligned token prefixes.
        # `prefix_cache_host=True` keeps entries in HOST RAM sliced to
        # their block-aligned length instead of pinning a full
        # [1, max_seq, ...] device row per entry — a device entry costs
        # ~335 MB at 12B/2048-token shapes (HBM is the scarce resource
        # next to 12 GB of weights), a host entry costs ~160 KB/token of
        # plain RAM plus an admission-time upload through a bucketed
        # placer program. Same hits, same outputs; trade HBM for a few
        # ms of PCIe per hit.
        self.prefix_cache = int(prefix_cache)
        self.prefix_block = int(prefix_block)
        self.prefix_cache_host = bool(prefix_cache_host)
        self._placer_progs: dict[int, Callable] = {}
        self._pentries: dict[int, dict] = {}     # eid → entry (LRU)
        self._phash: dict[bytes, int] = {}       # prefix bytes → eid
        self._peid = itertools.count()
        self._temps = np.zeros((self.slots,), np.float32)
        # OpenAI-style per-slot penalties + completion-token counts
        # (freq·count + pres·1[count>0] subtracted from the logits
        # before every draw; zero penalties are a bitwise no-op so one
        # program serves penalized and plain traffic)
        self._fp = np.zeros((self.slots,), np.float32)
        self._pp = np.zeros((self.slots,), np.float32)
        self._fp_dev = None
        self._pp_dev = None
        self._counts = None            # [slots, V] f32, lazily built
        self._bias = None              # [slots, V] static logit_bias
        #                                rows (same setters as counts)
        # logprobs-requesting slots decode sequentially in spec mode
        # (their per-token lp is extracted at the position-0 draw)
        self._lpf = np.zeros((self.slots,), bool)
        self._lpf_dev = None
        # device mirror of _temps, refreshed only on admission: an
        # upload per DISPATCH costs a full tunnel round trip (~30 ms,
        # measured as ~40% overhead on a 190 ms batch-8 dispatch)
        self._temps_dev = None
        # adaptive speculation (device path only): speculation pays iff
        # the accepted-run length beats the verify step's cost premium
        # over a plain decode step (`spec_breakeven`, measured at ~1.6×
        # for a 1+7-position verify on the 12B int8 —
        # benchmarks/bench_continuous_spec.py). The engine measures
        # tokens-per-slot-step online (EMA over dispatches); when the
        # pool isn't quoting (acceptance ≈ 1) it falls back to the
        # plain chunked program for `spec_hold` dispatches, then
        # re-probes, doubling the hold (≤ spec_hold_max) while probes
        # keep failing. Every mode is greedy-lossless, so switching is
        # output-invisible (tests/test_continuous.py adaptive tests).
        self.adaptive = bool(adaptive)
        self.spec_breakeven = float(spec_breakeven)
        self.spec_hold = int(spec_hold)
        self.spec_probe = int(spec_probe)
        self.spec_hold_max = int(spec_hold_max)
        self._spec_mode = True
        self._spec_seen = 0
        self._accept_ema: float | None = None
        self._hold_len = self.spec_hold
        self._plain_left = 0
        if self.speculative:
            self._argmax_jit = jax.jit(
                lambda lg: jnp.argmax(lg, -1).astype(jnp.int32))
            self._verify_jit = self._build_verify()
            if self._draft_fn is None:
                # device path: drafting runs IN-PROGRAM and `chunk`
                # verify steps scan per dispatch — zero host syncs
                # (a host draft_fn forces the step-per-dispatch path)
                self._spec_chunk_jit = self._build_spec_chunk()
                self._ids_buf = jnp.full(
                    (self.slots, self.cfg.max_seq_len),
                    self.sampling.pad_id, jnp.int32)
                self._limits = jnp.zeros((self.slots,), jnp.int32)
                # speculative-SAMPLING residual state: the rejected
                # draft token a slot must exclude from its next draw
                # (-1 = none); crosses dispatch boundaries so the
                # residual draw stays exact between chunks
                self._excl = np.full((self.slots,), -1, np.int32)
                self._insert_hist_jit = jax.jit(self._insert_hist_fn,
                                                donate_argnums=(0, 1))

        # probe dtypes with a 1-row prefill, then build the pool carry
        probe_ids = jnp.full((1, 8), self.sampling.pad_id, jnp.int32)
        logits1, _ = generator._prefill(1, 8)(
            self._params, probe_ids, jnp.ones((1,), jnp.int32))
        b = self.slots
        # carry[4]: PER-SLOT sampling seeds (uint32). Draws everywhere
        # are position-keyed off them (models/generate.py step_keys):
        # key = fold_in(fold_in(key(seed), pos), tag) — no shared rng
        # stream rides the carry, so a sampled request's tokens are a
        # pure function of (prompt, sampling params, seed), whatever
        # shares the pool and whenever it joined. `rng_seed` only
        # salts the DEFAULT per-request seed (mix_seed(rng_seed, rid))
        # for submits that don't pin one.
        self._base_seed = int(rng_seed)
        self._carry = (
            jnp.zeros((b,) + logits1.shape[1:], logits1.dtype),
            DecoderModel.init_cache(self.cfg, b),
            jnp.zeros((b,), jnp.int32),
            jnp.ones((b,), bool),                 # done=True → slot free
            jnp.zeros((b,), jnp.uint32),
        )
        # donate the pool carry through every program that replaces it:
        # the carry holds the full [slots, max_seq] KV tree (2 GB at
        # 12B/8 slots int8) and functional double-buffering of it is
        # what capped the slot count
        self._insert_jit = jax.jit(self._insert_fn,
                                   donate_argnums=(0,))
        self._release_jit = jax.jit(self._release_fn,
                                    donate_argnums=(0,))

    # ---------------------------------------------------------- jit bits
    @staticmethod
    def _insert_fn(carry, slot, logits1, caches1, length1, seed1):
        logits, caches, pos, done, seeds = carry
        upd = lambda full, one: jax.lax.dynamic_update_index_in_dim(
            full, one[0], slot, axis=0)
        logits = upd(logits, logits1)
        caches = jax.tree.map(upd, caches, caches1)
        pos = pos.at[slot].set(length1)
        done = done.at[slot].set(False)
        seeds = seeds.at[slot].set(seed1)
        return (logits, caches, pos, done, seeds)

    @staticmethod
    def _release_fn(carry, slot):
        logits, caches, pos, done, seeds = carry
        return (logits, caches, pos, done.at[slot].set(True), seeds)

    @staticmethod
    def _insert_hist_fn(ids_buf, limits, slot, ids_row, limit):
        ids_buf = jax.lax.dynamic_update_slice(
            ids_buf, ids_row[None], (slot, 0))
        return ids_buf, limits.at[slot].set(limit)

    def _build_verify(self):
        """One cached forward over (1 + draft_len) positions for every
        slot; returns per-slot accepted-run length n_acc ∈ [1, 1+K]
        (0 for free slots) and the chosen first token t1 (argmax for
        greedy slots, drawn in-program for sampled ones — sampled slots
        never accept drafts, so they advance exactly 1). Rejected
        positions leave stale K/V behind the pointer; the next step's
        write window starts at the new pointer and spans 1+K positions,
        which always covers the stale region before attention reads it
        (decoder.py scatter-then-attend), so no cleanup pass is
        needed."""
        cfg, k = self.cfg, self.draft_len
        top_k = self.sampling.top_k
        top_p = self.sampling.top_p
        model = self.gen.model

        @functools.partial(jax.jit, donate_argnums=(1, 4))
        def verify(params, carry, drafts, temps, counts, freqs, pres,
                   biases, wantlp):
            logits, caches, pos, done, seeds = carry
            live = ~done
            pl = apply_penalties(logits, counts, freqs, pres, biases)
            t1 = topk_topp_sample(pl, temps, step_keys(seeds, pos, 0),
                                  top_k, top_p)
            lp1, lti, ltv = sampling_logprobs(pl, temps, t1)
            inputs = jnp.concatenate([t1[:, None], drafts], axis=1)
            positions = pos[:, None] + jnp.arange(1 + k)[None, :]
            wmask = live[:, None] & (positions < cfg.max_seq_len)
            pos_c = jnp.clip(positions, 0, cfg.max_seq_len - 1)
            la, caches = model.apply(params, inputs, pos_c, caches,
                                     attn_mask=None, write_mask=wmask)
            g = jnp.argmax(la, -1).astype(jnp.int32)
            ok = inputs[:, 1:] == g[:, :-1]
            # penalized rows can't verify drafts in parallel (their
            # target depends on the run's own earlier tokens): n_acc=1
            # — negative penalties included (review finding). Biased
            # rows join them conservatively: the parallel greedy check
            # argmaxes RAW logits, which a bias may reorder, so they
            # advance one (bias-correct) token per step instead
            pen = penalized_rows(freqs, pres) \
                | jnp.any(biases != 0, axis=-1) | wantlp
            n_acc = 1 + jnp.where(
                (temps > 0) | pen, 0,
                jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1),
                        axis=1))
            n_acc = jnp.where(live, n_acc, 0)
            emitted = jnp.arange(1 + k)[None, :] < n_acc[:, None]
            counts = counts.at[
                jnp.arange(inputs.shape[0])[:, None], inputs].add(
                emitted.astype(jnp.float32))
            new_logits = jnp.take_along_axis(
                la, jnp.clip(n_acc - 1, 0)[:, None, None], axis=1)[:, 0]
            logits = jnp.where(live[:, None], new_logits, logits)
            return (logits, caches, pos + n_acc, done, seeds), n_acc, \
                t1, counts, lp1, lti, ltv

        return verify

    def _build_spec_chunk(self):
        """`chunk` draft→verify→accept steps scanned in ONE program:
        drafting runs on device over each slot's own token buffer
        (models/speculative.py prompt_lookup_draft), EOS and per-slot
        budgets resolve in-program, and the host only harvests the
        (tokens, valid) matrices once per dispatch. This is what makes
        pool speculation pay off behind a high-RTT dispatch link: the
        host-drafted path syncs every verify step (~28 ms on the axon
        tunnel — measured in benchmarks/bench_continuous_spec.py),
        the scanned path amortizes one dispatch over
        chunk × accepted-run tokens."""
        from ..models.generate import truncated_token_prob
        from ..models.speculative import prompt_lookup_draft

        cfg, k, n = self.cfg, self.draft_len, self.ngram
        eos, pad = self.sampling.eos_id, self.sampling.pad_id
        top_k = self.sampling.top_k
        top_p = self.sampling.top_p
        b, S = self.slots, self.chunk
        model = self.gen.model
        draft_src = self._device_draft_fn or (
            lambda buf, cur: prompt_lookup_draft(buf, cur, k, n, pad))

        @functools.partial(jax.jit, donate_argnums=(1, 2, 6))
        def spec_chunk(params, carry, ids_buf, limits, temps, excl0,
                       counts0, freqs, pres, biases, wantlp):
            L = ids_buf.shape[1]
            idx = jnp.arange(1 + k)[None, :]
            rowi = jnp.arange(b)
            # a penalized slot's target distribution depends on the
            # run's OWN earlier tokens, so parallel draft verification
            # is unsound for it — it decodes sequentially (n_acc=1)
            # while unpenalized neighbors keep speculating. Negative
            # penalties count too (review finding: they reshape the
            # distribution just as much). Biased rows decode
            # sequentially too: the greedy acceptance check and the
            # draft-probability computation read raw `la` logits,
            # which the bias reorders
            pen = penalized_rows(freqs, pres) \
                | jnp.any(biases != 0, axis=-1) | wantlp

            def step(c, _):
                logits, caches, pos, done, seeds, ids_buf, excl, \
                    counts = c
                live = ~done
                # `excl` carries the rejected draft token of the last
                # step's speculative-sampling rejection (-1 = none):
                # this draw IS the residual draw — the rejected token's
                # mass removed from the kept set, rest renormalized
                pl = apply_penalties(logits, counts, freqs, pres,
                                     biases)
                t1 = topk_topp_sample(pl, temps,
                                      step_keys(seeds, pos, 0), top_k,
                                      top_p, exclude=excl)
                lp1, lti, ltv = sampling_logprobs(pl, temps, t1)
                # write t1 at pos so the tail n-gram includes it
                cur_c = jnp.clip(pos, 0, L - 1)
                old = ids_buf[rowi, cur_c]
                ids_buf = ids_buf.at[rowi, cur_c].set(
                    jnp.where(live, t1, old))
                drafts = draft_src(ids_buf, pos + 1)
                inputs = jnp.concatenate([t1[:, None], drafts], axis=1)
                positions = pos[:, None] + idx
                wmask = live[:, None] & (positions < cfg.max_seq_len)
                pos_c = jnp.clip(positions, 0, cfg.max_seq_len - 1)
                la, caches = model.apply(params, inputs, pos_c, caches,
                                         attn_mask=None,
                                         write_mask=wmask)
                g = jnp.argmax(la, -1).astype(jnp.int32)
                ok_greedy = inputs[:, 1:] == g[:, :-1]
                # SPECULATIVE SAMPLING (temps > 0): accept draft d_i
                # with prob p_i(d_i) under the target's truncated
                # distribution (the draft is deterministic prompt-
                # lookup, a point-mass q, so min(1, p/q) = p); the
                # first rejection's token is excluded from the next
                # t1 draw (residual) — emitted marginals equal plain
                # sampling exactly (unit identity in tests)
                u = jax.vmap(lambda kk_: jax.random.uniform(kk_, (k,)))(
                    step_keys(seeds, pos, 1))
                p_draft = truncated_token_prob(
                    la[:, :-1].reshape(b * k, -1),
                    jnp.repeat(temps, k),
                    drafts.reshape(b * k), top_k, top_p,
                ).reshape(b, k)
                ok_samp = u < p_draft
                ok = jnp.where((temps > 0)[:, None], ok_samp,
                               ok_greedy) & ~pen[:, None]
                n_acc = 1 + jnp.sum(
                    jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)
                # first rejected draft (if any) → excluded next draw;
                # penalized rows never speculate, so no residual state
                rej = n_acc <= k
                d_rej = jnp.take_along_axis(
                    drafts, jnp.clip(n_acc - 1, 0, k - 1)[:, None],
                    axis=1)[:, 0]
                excl = jnp.where((temps > 0) & rej & live & ~pen,
                                 d_rej, -1)
                base = (idx < n_acc[:, None]) & live[:, None] \
                    & (positions < limits[:, None])
                is_eos = (inputs == eos) & base
                after = (jnp.cumsum(is_eos.astype(jnp.int32), axis=1)
                         - is_eos) > 0
                valid = base & ~after            # EOS emitted too
                nv = jnp.sum(valid.astype(jnp.int32), axis=1)
                # accepted drafts extend ids_buf (t1 already written;
                # invalid targets one-hot to L → write nowhere)
                tgt = jnp.where(valid & (idx > 0), positions, L)
                oh = jax.nn.one_hot(tgt, L, dtype=jnp.int32)
                cov = jnp.sum(oh, axis=1)
                ids_buf = ids_buf * (1 - cov) + jnp.einsum(
                    "bim,bi->bm", oh, inputs)
                new_logits = jnp.take_along_axis(
                    la, jnp.clip(nv - 1, 0)[:, None, None],
                    axis=1)[:, 0]
                keep = live[:, None] & (nv > 0)[:, None]
                logits = jnp.where(keep, new_logits, logits)
                counts = counts.at[rowi[:, None], inputs].add(
                    valid.astype(jnp.float32))
                pos = pos + nv
                done = done | jnp.any(is_eos & valid, axis=1) \
                    | (pos >= limits)
                return (logits, caches, pos, done, seeds, ids_buf,
                        excl, counts), (inputs, valid, lp1, lti, ltv)

            logits, caches, pos, done, seeds = carry
            (logits, caches, pos, done, seeds, ids_buf, excl, counts), \
                (toks, valid, lps, ltis, ltvs) = jax.lax.scan(
                    step,
                    (logits, caches, pos, done, seeds, ids_buf, excl0,
                     counts0),
                    None, length=S)
            return (logits, caches, pos, done, seeds), ids_buf, \
                toks, valid, excl, counts, lps, ltis, ltvs

        return spec_chunk

    # ------------------------------------------------------------ public
    def warm(self, prompt_buckets: tuple[int, ...] | None = None,
             max_new: int = 8) -> None:
        """Pre-compile the engine's device programs so no production
        request pays a first-shape compile mid-flight (through the axon
        remote-compile path a single 16-slot spec program measured
        minutes — it landed as a 410 s p95 on an otherwise 7 s
        sequential arm). Compiles: one prefill/extend per prompt
        bucket, the plain and speculative decode dispatch programs, and
        the insert/release plumbing — by running one real throwaway
        request per bucket with speculation forced on AND off."""
        prompt_buckets = prompt_buckets or WARM_BUCKETS
        snap = dict(self.stats)
        pre_entries = set(self._pentries)
        room = self.cfg.max_seq_len - max_new \
            - (self.draft_len if self.speculative else 0) - 1
        spec_states = (True, False) if self.speculative and self.adaptive \
            else (self._spec_mode,)
        warm_rids = []
        for spec_on in spec_states:
            for j, b in enumerate(prompt_buckets):
                n = min(int(b), max(room, 1))
                # distinct token per bucket: identical warm prompts
                # would prefix-cache-hit each other and skip the very
                # full-prefill programs this is trying to compile
                ids = np.full((n,), 3 + j % 64, np.int32)
                rid = self.submit(ids, n, max_new)
                warm_rids.append(rid)
                if self.speculative and self.adaptive:
                    self._spec_mode = spec_on
                    self._plain_left = 0 if spec_on else 10**9
                while not self._requests[rid].done and self.busy:
                    self.step()
        # leave no trace: restore counters, drop the WARM-added prefix
        # entries (pre-existing production entries stay hot), remove
        # the throwaway requests, restore the adaptive posture
        self.stats.update(snap)
        for eid in [e for e in self._pentries if e not in pre_entries]:
            entry = self._pentries.pop(eid)
            for k in entry["keys"]:
                if self._phash.get(k) == eid:
                    del self._phash[k]
        for rid in warm_rids:
            self._requests.pop(rid, None)
        if self.speculative and self.adaptive:
            self._spec_mode = True
            self._spec_seen = 0
            self._accept_ema = None
            self._plain_left = 0
            self._hold_len = self.spec_hold

    def _check_bias(self, logit_bias) -> dict | None:
        """Normalize a {token_id: bias} mapping: int keys in vocab,
        finite float values. Loud errors here — a bad id would
        otherwise scatter out of bounds (silently clamped on TPU)."""
        if not logit_bias:
            return None
        out = {}
        for t, v in logit_bias.items():
            t, v = int(t), float(v)
            if not 0 <= t < self.cfg.vocab_size:
                raise ValueError(
                    f"logit_bias token id {t} outside vocab "
                    f"[0, {self.cfg.vocab_size})")
            if not np.isfinite(v):
                raise ValueError("logit_bias values must be finite")
            out[t] = v
        return out

    def _check_logprobs(self, logprobs) -> int | None:
        """None = off; 0..LOGPROB_TOPK = how many top alternatives to
        keep per emitted token (the chosen token's lp always comes)."""
        if logprobs is None:
            return None
        from ..models.generate import LOGPROB_TOPK

        lp = int(logprobs)
        if not 0 <= lp <= LOGPROB_TOPK:
            raise ValueError(
                f"logprobs must be in [0, {LOGPROB_TOPK}], got {lp}")
        return lp

    def submit(self, prompt_ids, length: int, max_new: int,
               on_token: Callable | None = None,
               temperature: float | None = None,
               priority: int = 0,
               frequency_penalty: float = 0.0,
               presence_penalty: float = 0.0,
               logit_bias: dict | None = None,
               logprobs: int | None = None,
               seed: int | None = None) -> int:
        """Queue a request; returns its id. `on_token(rid, token_id)`
        fires per decoded token (streaming). `temperature` overrides
        the engine default for THIS request (≤0 = greedy). `priority`
        orders admission (lower first; ties FIFO — see __init__ for
        aging/preemption). `frequency_penalty`/`presence_penalty`
        (OpenAI semantics over completion tokens) penalize repeats;
        a penalized slot decodes sequentially in spec mode (the
        penalty makes the target distribution depend on the run's own
        earlier tokens, so parallel draft verification would be
        unsound — neighbors keep speculating). `seed` pins THIS
        request's sampling stream (OpenAI `seed` semantics): draws are
        position-keyed off it, so the same (prompt, params, seed)
        reproduces the same tokens whatever shares the pool; None
        derives a fresh deterministic seed from the engine's base seed
        and the request id. `logit_bias` ({token_id: bias}) adds a
        static per-request adjustment to every draw's logits (OpenAI
        semantics; ±100 effectively forces/bans); like penalties, a
        biased slot decodes sequentially in spec mode while neighbors
        keep speculating. Admission happens at the next `step()` if
        a slot is free."""
        from ..tokenize.base import bucket_length

        logit_bias = self._check_bias(logit_bias)
        logprobs = self._check_logprobs(logprobs)

        ids = np.asarray(prompt_ids, np.int32).reshape(-1)
        length = min(int(length), len(ids))
        # bucket the prompt so the prefill program count stays bounded;
        # speculative mode reserves the verify window past the budget
        room = self.cfg.max_seq_len - max_new \
            - (self.draft_len if self.speculative else 0)
        s = min(bucket_length(max(len(ids), 1)), room)
        if length > s:   # explicit: silent truncation would decode a
            #              corrupted prompt (and -O strips asserts)
            raise ValueError(
                f"prompt length {length} + max_new {max_new} exceeds "
                f"max_seq_len {self.cfg.max_seq_len}")
        padded = np.full((s,), self.sampling.pad_id, np.int32)
        padded[:min(len(ids), s)] = ids[:s]
        ids = padded
        temp = self.sampling.temperature if temperature is None \
            else float(temperature)
        rid = next(self._rid)
        req = _Request(rid=rid, ids=ids, length=int(length),
                       max_new=int(max_new), temperature=temp,
                       frequency_penalty=float(frequency_penalty),
                       presence_penalty=float(presence_penalty),
                       seed=(mix_seed(self._base_seed, rid)
                             if seed is None
                             else int(seed) & 0xFFFFFFFF),
                       on_token=on_token, priority=int(priority),
                       submit_step=self.stats["steps"],
                       logit_bias=logit_bias, want_logprobs=logprobs)
        self._queue.append(req)
        self._requests[req.rid] = req
        return req.rid

    def submit_embeds(self, embeds, length: int, max_new: int,
                      on_token: Callable | None = None,
                      temperature: float | None = None,
                      priority: int = 0,
                      frequency_penalty: float = 0.0,
                      presence_penalty: float = 0.0,
                      logit_bias: dict | None = None,
                      logprobs: int | None = None,
                      seed: int | None = None) -> int:
        """Queue a MULTIMODAL request: `embeds` [S, H] (or [1, S, H])
        is the full prefix — prompt-token embeddings with projected
        image patches spliced in (models/llava.py `encode_patches` +
        `_splice_program` build it entirely on device). The request decodes co-resident
        with text requests in the same pool programs; only its prefill
        differs (`_prefill_embeds`). Differences from `submit`:
        no prefix-cache participation (entries key by token bytes),
        never preempted (recompute resume can't rebuild a spliced
        prefix from ids), and the speculative draft history sees only
        its EMITTED tokens (prompt positions stay pad — drafts remain
        lossless, just fewer early matches)."""
        from ..tokenize.base import bucket_length

        logit_bias = self._check_bias(logit_bias)
        logprobs = self._check_logprobs(logprobs)
        e = jnp.asarray(embeds)
        if e.ndim == 3:
            e = e[0]
        room = self.cfg.max_seq_len - max_new \
            - (self.draft_len if self.speculative else 0)
        s = min(bucket_length(max(e.shape[0], 1)), room)
        length = min(int(length), e.shape[0])
        if length > s:   # explicit: slicing would chop real image/
            #              prompt embeddings (and -O strips asserts)
            raise ValueError(
                f"embeds length {length} + max_new {max_new} exceeds "
                f"max_seq_len {self.cfg.max_seq_len}")
        if e.shape[0] != s:   # re-bucket to the budgeted width
            if e.shape[0] > s:
                e = e[:s]    # only padding past `length` is cut
            else:
                e = jnp.pad(e, ((0, s - e.shape[0]), (0, 0)))
        temp = self.sampling.temperature if temperature is None \
            else float(temperature)
        rid = next(self._rid)
        req = _Request(rid=rid,
                       ids=np.full((s,), self.sampling.pad_id,
                                   np.int32),
                       length=int(length), max_new=int(max_new),
                       temperature=temp,
                       frequency_penalty=float(frequency_penalty),
                       presence_penalty=float(presence_penalty),
                       seed=(mix_seed(self._base_seed, rid)
                             if seed is None
                             else int(seed) & 0xFFFFFFFF),
                       on_token=on_token, priority=int(priority),
                       submit_step=self.stats["steps"],
                       logit_bias=logit_bias, want_logprobs=logprobs,
                       embeds=e)
        self._queue.append(req)
        self._requests[req.rid] = req
        return req.rid

    def cancel(self, rid: int) -> bool:
        """Abort a request: queued → never admits, prefilling → its
        segments stop, active → the slot frees NOW (before the next
        dispatch) and the next queued request takes it. The request's
        partial `tokens` remain readable via `result(rid)`. Returns
        True iff the request was still live. Engine methods are
        single-threaded — under a ContinuousDriver, route cancels
        through the driver (it runs them on the decode thread).

        Slot-reuse safety is the admission argument unchanged: a freed
        slot's stale K/V rows are overwritten by the next occupant's
        prefill insert, and rows past its write pointer stay causally
        masked (same scatter-then-attend invariant as EOS release)."""
        req = self._requests.get(rid)
        if req is None or req.done:
            return False
        req.done = True
        if req in self._queue:
            self._queue.remove(req)
        for slot, st in list(self._prefilling.items()):
            if st["req"] is req:
                del self._prefilling[slot]
        slot = req.slot
        if slot >= 0 and self._active.get(slot) is req:
            del self._active[slot]
            self._carry = self._release_jit(self._carry,
                                            jnp.int32(slot))
        self.stats["cancelled"] += 1
        return True

    def _order_key(self, req: _Request) -> tuple[int, int]:
        """Admission order: (effective priority, arrival). With aging
        on, a request's effective priority improves one level per
        `age_steps` engine steps waited, bounding starvation."""
        eff = req.priority
        if self.age_steps:
            eff -= (self.stats["steps"] - req.submit_step) \
                // self.age_steps
        return (eff, req.rid)

    def _admit_into(self, slot: int, req: _Request):
        if self.prefill_chunk and req.length > self.prefill_chunk \
                and req.embeds is None:
            # long prompt: prefill in segments across steps so the
            # pool keeps decoding in between (_prefill_step)
            self._prefilling[slot] = self._prefill_begin(req)
            req.slot = slot
            return
        logits1, caches1 = self._prefill_row(req)
        self._activate(slot, req, logits1, caches1)

    def _preempt(self, req: _Request):
        """Evict an ACTIVE request from its slot (recompute
        preemption): the slot frees now — stale K/V rows are
        overwritten by the next occupant, the same scatter-then-attend
        invariant as cancel/EOS release — and the victim re-queues.
        On re-admission it re-prefills prompt + everything already
        emitted, so decoding resumes bit-identically to an
        uninterrupted run — greedy via prefill-then-decode ≡ decode
        chain (the engine's core parity property), SAMPLED via
        position-keyed draws (the resumed slot re-derives the same
        keys at the same positions from its unchanged seed; only a
        pending speculative-sampling exclusion is dropped, see
        `_activate`). `tokens` stays CUMULATIVE
        (`consumed` marks what `ids` now bakes in), so harvest,
        budget checks and driver bookkeeping are untouched."""
        from ..tokenize.base import bucket_length

        slot = req.slot
        del self._active[slot]
        self._carry = self._release_jit(self._carry, jnp.int32(slot))
        req.slot = -1
        req.preempt_count += 1
        hist = np.concatenate([
            req.ids[:req.length],
            np.asarray(req.tokens[req.consumed:], np.int32)])
        req.consumed = len(req.tokens)
        remaining = req.max_new - req.consumed
        room = self.cfg.max_seq_len - remaining \
            - (self.draft_len if self.speculative else 0)
        s = min(bucket_length(len(hist)), room)
        assert len(hist) <= s, "preempt: resume prompt exceeds budget"
        padded = np.full((s,), self.sampling.pad_id, np.int32)
        padded[:len(hist)] = hist
        req.ids = padded
        req.length = len(hist)
        self.stats["preempted"] += 1

    def _admit(self):
        free = [s for s in range(self.slots)
                if s not in self._active and s not in self._prefilling]
        while free and self._queue:
            slot = free.pop(0)
            req = min(self._queue, key=self._order_key)
            self._queue.remove(req)
            self._admit_into(slot, req)
        if not (self.preemption and self._queue and self._active):
            return
        # recompute preemption: while a queued request strictly
        # outranks the worst unpinned active one, swap them
        while self._queue and self._active:
            best = min(self._queue, key=self._order_key)
            victims = [r for r in self._active.values()
                       if r.preempt_count < self.max_preempt
                       and r.embeds is None]
            if not victims:
                return
            worst = max(victims, key=lambda r: (r.priority, r.rid))
            if self._order_key(best)[0] >= worst.priority:
                return
            self._queue.remove(best)
            slot = worst.slot
            self._preempt(worst)
            self._queue.append(worst)
            self._admit_into(slot, best)

    def _activate(self, slot: int, req: _Request, logits1, caches1):
        """Insert a fully-prefilled single-row cache into the pool and
        mark the slot live for the next decode dispatch."""
        self._carry = self._insert_jit(
            self._carry, jnp.int32(slot), logits1, caches1,
            jnp.int32(req.length), jnp.uint32(req.seed))
        req.slot = slot
        self._active[slot] = req
        self._temps[slot] = req.temperature
        self._temps_dev = jnp.asarray(self._temps)
        self._fp[slot] = req.frequency_penalty
        self._pp[slot] = req.presence_penalty
        self._fp_dev = jnp.asarray(self._fp)
        self._pp_dev = jnp.asarray(self._pp)
        self._lpf[slot] = req.want_logprobs is not None
        self._lpf_dev = jnp.asarray(self._lpf)
        # completion-token counts: zero for a fresh request; a
        # preemption-resumed one rebuilds from the tokens already baked
        # into ids (penalty state survives eviction exactly)
        counts = self._counts_dev()   # builds the setters on first use
        if req.tokens and (req.frequency_penalty
                           or req.presence_penalty):
            # penalized preemption-resume: rebuild the row from the
            # tokens already emitted so penalty state survives eviction
            row = np.zeros((self.cfg.vocab_size,), np.float32)
            np.add.at(row, np.asarray(req.tokens, np.int64), 1.0)
            self._counts = self._counts_set_jit(
                counts, jnp.int32(slot), jnp.asarray(row))
        else:
            # the common case: zero the slot in-place on device — no
            # [V]-sized host→device upload per admission (review
            # finding: ~0.5 MB over the ~28 ms-RTT tunnel, every time)
            self._counts = self._counts_zero_jit(counts,
                                                 jnp.int32(slot))
        # static logit_bias row: rebuilt on every admission (covers
        # preemption resume — the bias is a pure function of the
        # request), zeroed for unbiased occupants so slot reuse can't
        # leak a predecessor's bias
        bias = self._bias_dev()
        if req.logit_bias:
            row = np.zeros((self.cfg.vocab_size,), np.float32)
            for t, v in req.logit_bias.items():
                row[int(t)] = float(v)
            self._bias = self._counts_set_jit(bias, jnp.int32(slot),
                                              jnp.asarray(row))
        else:
            self._bias = self._counts_zero_jit(bias, jnp.int32(slot))
        if getattr(self, "_excl", None) is not None:
            # a fresh (or resumed) occupant has no pending residual
            # exclusion; a preemption that lands between rejection and
            # redraw drops the exclusion — the one token then draws
            # from full p instead of the residual (bias bounded by
            # p(d_rej) once per preemption; documented in the class)
            self._excl[slot] = -1
        if self.speculative and self._draft_fn is None:
            # emission cap is length + REMAINING budget: for a
            # preemption-resumed request `ids` already bakes in
            # `consumed` emitted tokens
            self._ids_buf, self._limits = self._insert_hist_jit(
                self._ids_buf, self._limits, jnp.int32(slot),
                jnp.asarray(req.ids),
                jnp.int32(req.length + req.max_new - req.consumed))
        if self.prefix_cache and not req.consumed \
                and req.embeds is None:
            # a resumed request's "prompt" tail is generated text —
            # caching it would only pollute the prefix LRU; embeds
            # prefixes have no token key to store under
            self._prefix_store(req, caches1)
        self.stats["admitted"] += 1

    def _prefill_begin(self, req: _Request) -> dict:
        """Start an incremental prefill, reusing any cached block-
        aligned prefix (the chunked path composes with the prefix
        cache: a hit skips its blocks entirely)."""
        p, entry = self._prefix_lookup(req)
        if entry is not None:
            self.stats["prefix_hits"] += 1
            self.stats["prefix_saved_tokens"] += p
        return {"req": req, "done_to": p,
                "caches": self._entry_caches(entry) if entry else None,
                "logits": None}

    def _prefill_step(self, st: dict) -> bool:
        """Advance one bounded prefill segment; True when the prompt is
        fully prefilled (st then holds the row's logits + caches).

        Segments bucket like prompts do, so the program count stays
        bounded: interior segments are all (extend, 1, prefill_chunk);
        the final partial segment buckets down."""
        from ..tokenize.base import bucket_length

        req, p = st["req"], st["done_to"]
        seg = min(self.prefill_chunk, req.length - p)
        s2 = min(bucket_length(seg), self.cfg.max_seq_len - p)
        suffix = np.full((s2,), self.sampling.pad_id, np.int32)
        suffix[:seg] = req.ids[p:p + seg]
        if p == 0:
            logits1, caches1 = self.gen._prefill(1, s2)(
                self._params, jnp.asarray(suffix[None]),
                jnp.asarray([seg], jnp.int32))
        else:
            logits1, caches1 = self.gen._extend(1, s2)(
                self._params, jnp.asarray(suffix[None]),
                jnp.asarray([p], jnp.int32),
                jnp.asarray([seg], jnp.int32), st["caches"])
        st["caches"], st["logits"] = caches1, logits1
        st["done_to"] = p + seg
        self.stats["prefill_segments"] += 1
        return st["done_to"] >= req.length

    # ------------------------------------------------- prefix caching
    def _prefill_row(self, req: _Request):
        """Prefill one request into a single cache row, reusing the
        longest cached block-aligned token prefix when the prefix cache
        is enabled.

        Correctness: causal K/V at position i depends only on tokens
        ≤ i, so two prompts sharing their first p tokens share their
        first p cache rows exactly; an entry row therefore serves ANY
        request matching a block-aligned prefix of the entry's prompt —
        the `_extend` program overwrites positions p..p+suffix and
        everything past the write pointer stays causally invisible
        (same scatter-then-attend argument as slot reuse)."""
        from ..tokenize.base import bucket_length

        if req.embeds is not None:
            # multimodal prefix: whole-row embeds prefill (no prefix
            # cache — entries key by token bytes; no chunking — the
            # spliced prefix has no id segments to extend from)
            s = req.embeds.shape[0]
            return self.gen._prefill_embeds(1, s)(
                self._params, req.embeds[None],
                jnp.asarray([req.length], jnp.int32))
        p, entry = self._prefix_lookup(req)
        if entry is None:
            s = len(req.ids)
            logits1, caches1 = self.gen._prefill(1, s)(
                self._params, jnp.asarray(req.ids[None]),
                jnp.asarray([req.length], jnp.int32))
        else:
            suf_len = req.length - p
            s2 = min(bucket_length(suf_len),
                     self.cfg.max_seq_len - p)
            suffix = np.full((s2,), self.sampling.pad_id, np.int32)
            suffix[:suf_len] = req.ids[p:req.length]
            logits1, caches1 = self.gen._extend(1, s2)(
                self._params, jnp.asarray(suffix[None]),
                jnp.asarray([p], jnp.int32),
                jnp.asarray([suf_len], jnp.int32),
                self._entry_caches(entry))
            self.stats["prefix_hits"] += 1
            self.stats["prefix_saved_tokens"] += p
        return logits1, caches1

    def _entry_caches(self, entry):
        """Materialize a cache entry as a full-shape device row.
        Device entries hold a bucket-sliced [1, sb, ...] tree and
        replay through a device-side placer; host entries pay one
        upload of their block-aligned slice (padded to the same
        bucket so the placer program count stays bounded). Positions
        past the prefix are causally invisible until overwritten."""
        if "kv_dev" in entry:
            return self._placer(entry["sb"])(entry["kv_dev"])
        from ..tokenize.base import bucket_length

        plen = entry["len"]
        sb = min(bucket_length(plen), self.cfg.max_seq_len)
        kv = jax.tree.map(
            lambda a: jnp.asarray(np.pad(
                a, [(0, 0), (0, sb - plen)]
                + [(0, 0)] * (a.ndim - 2))) if sb > plen
            else jnp.asarray(a),
            entry["kv_host"])
        return self._placer(sb)(kv)

    def _slicer(self, sb: int):
        """jit: full [1, max_seq, ...] row tree → [1, sb, ...] slice."""
        key = ("slice", sb)
        if key not in self._placer_progs:

            @jax.jit
            def slice_(caches):
                return jax.tree.map(lambda a: a[:, :sb], caches)

            self._placer_progs[key] = slice_
        return self._placer_progs[key]

    def _placer(self, sb: int):
        if sb not in self._placer_progs:
            cfg = self.cfg

            @jax.jit
            def place(kv):
                full = DecoderModel.init_cache(cfg, 1)
                return jax.tree.map(
                    lambda f, p: jax.lax.dynamic_update_slice(
                        f, p.astype(f.dtype), (0,) * f.ndim),
                    full, kv)

            self._placer_progs[sb] = place
        return self._placer_progs[sb]

    def _prefix_lookup(self, req: _Request):
        """Longest cached block-aligned prefix of this prompt, leaving
        at least one suffix token to produce the first logits."""
        if not self.prefix_cache:
            return 0, None
        blk = self.prefix_block
        ids = req.ids[:req.length]
        m_max = (req.length - 1) // blk
        for m in range(m_max, 0, -1):
            eid = self._phash.get(ids[:m * blk].tobytes())
            if eid is not None:
                entry = self._pentries.pop(eid)    # LRU: move to end
                self._pentries[eid] = entry
                return m * blk, entry
        return 0, None

    def _prefix_store(self, req: _Request, caches1):
        """Register this prompt's full block-aligned prefix (the row
        covers positions < req.length, both on miss and on hit)."""
        blk = self.prefix_block
        m = req.length // blk
        if m < 1:
            return
        key = req.ids[:m * blk].tobytes()
        if key in self._phash:
            return                                 # already cached
        eid = next(self._peid)
        keys = [req.ids[:j * blk].tobytes() for j in range(1, m + 1)]
        for k in keys:
            self._phash.setdefault(k, eid)
        plen = m * blk
        if self.prefix_cache_host:
            kv_host = jax.tree.map(
                lambda a: np.asarray(a[:, :plen]), caches1)
            self._pentries[eid] = {"kv_host": kv_host, "len": plen,
                                   "keys": keys}
        else:
            # device entries are SLICED to the prefix's length bucket,
            # not pinned as full [1, max_seq] rows: at 12B a full row
            # is ~246 MB (123 int8-KV) while a 640-token entry is
            # ~50 MB — and a hit replays through the same placer
            # program the host path uses, entirely on device (no
            # tunnel upload per hit, which measured ~0.4-1 s each).
            # Positions [plen, sb) carry the DONOR row's suffix K/V;
            # that is safe for any borrower by the usual scatter-then-
            # attend argument (every position is overwritten before the
            # causal mask first admits it).
            from ..tokenize.base import bucket_length

            sb = min(bucket_length(plen), self.cfg.max_seq_len)
            kv_dev = self._slicer(sb)(caches1)
            self._pentries[eid] = {"kv_dev": kv_dev, "len": plen,
                                   "sb": sb, "keys": keys}
        while len(self._pentries) > self.prefix_cache:
            old_eid = next(iter(self._pentries))
            old = self._pentries.pop(old_eid)
            for k in old["keys"]:
                if self._phash.get(k) == old_eid:
                    del self._phash[k]

    def step(self) -> int:
        """Admit what fits, advance every active slot (by `chunk`
        tokens, or by one speculative verify), harvest, free finished
        slots. Returns the number of live tokens emitted."""
        self._admit()
        # advance every in-flight chunked prefill by one segment; a
        # prompt finishing here joins this same step's decode dispatch
        for slot in list(self._prefilling):
            st = self._prefilling[slot]
            if self._prefill_step(st):
                del self._prefilling[slot]
                self._activate(slot, st["req"], st["logits"],
                               st["caches"])
        if not self._active:
            return 0
        if self.speculative and self._draft_fn is None:
            if self._spec_mode or not self.adaptive:
                tokens, lpinfo = self._spec_chunk_advance()
                self.stats["spec_dispatches"] += 1
                if self.adaptive:
                    self._judge_speculation()
            else:
                # adaptive fallback to plain decode drops any pending
                # residual exclusion (the plain program draws from full
                # p; carrying stale exclusions into a later spec probe
                # would wrongly suppress a token)
                if getattr(self, "_excl", None) is not None:
                    self._excl[:] = -1
                tokens, lpinfo = self._plain_advance()
                self.stats["plain_dispatches"] += 1
                self._plain_left -= 1
                if self._plain_left <= 0:         # probe speculation
                    self._sync_ids_buf()
                    self._spec_mode = True
                    self._spec_seen = 0
                    self._accept_ema = None
        elif self.speculative:
            tokens, lpinfo = self._spec_advance()  # [slots, ≤1+K] lists
        else:
            tokens, lpinfo = self._plain_advance()  # [slots, chunk]
        self.stats["steps"] += 1
        self.stats["occupancy_sum"] += len(self._active)

        emitted = 0
        eos, pad = self.sampling.eos_id, self.sampling.pad_id
        for slot, req in list(self._active.items()):
            finished = False
            for i, t in enumerate(tokens[slot]):
                t = int(t)
                if len(req.tokens) >= req.max_new:
                    finished = True
                    break
                if t == eos:
                    finished = True
                    break
                if t == pad:      # post-EOS filler inside the chunk
                    finished = True
                    break
                req.tokens.append(t)
                if req.want_logprobs is not None and slot in lpinfo:
                    lp, ti, tv = lpinfo[slot][i]
                    k = req.want_logprobs
                    req.logprobs.append(
                        (float(lp),
                         [(int(a), float(b))
                          for a, b in zip(ti[:k], tv[:k])]))
                emitted += 1
                if req.on_token is not None:
                    try:
                        req.on_token(req.rid, t)
                    except Exception as cb_err:
                        # a raising callback fails ITS request only —
                        # letting it propagate would poison every
                        # future step (the request would stay active
                        # and re-raise per dispatch)
                        req.error = cb_err
                        req.on_token = None
                        finished = True
                        break
            if finished or len(req.tokens) >= req.max_new:
                req.done = True
                self._carry = self._release_jit(self._carry,
                                                jnp.int32(slot))
                del self._active[slot]
        self.stats["tokens"] += emitted
        return emitted

    def _counts_dev(self):
        """Lazy [slots, V] completion-token count matrix (f32 — 8 MB
        at V=131k/16 slots) + the jitted per-row setter."""
        if self._counts is None:
            self._counts = jnp.zeros(
                (self.slots, self.cfg.vocab_size), jnp.float32)
            self._counts_set_jit = jax.jit(
                lambda c, slot, row: jax.lax.dynamic_update_index_in_dim(
                    c, row, slot, axis=0),
                donate_argnums=(0,))
            self._counts_zero_jit = jax.jit(
                lambda c, slot: jax.lax.dynamic_update_index_in_dim(
                    c, jnp.zeros((c.shape[1],), c.dtype), slot, axis=0),
                donate_argnums=(0,))
        return self._counts

    def _bias_dev(self):
        """Lazy [slots, V] static logit_bias matrix; shares the
        per-row setter programs with the counts matrix (same shape and
        dtype)."""
        if self._bias is None:
            self._counts_dev()          # builds the shared setters
            self._bias = jnp.zeros(
                (self.slots, self.cfg.vocab_size), jnp.float32)
        return self._bias

    def _plain_advance(self):
        """One plain chunked-decode dispatch over the pool. Returns
        (tokens [slots, chunk], lpinfo) where lpinfo[slot] is a list of
        (lp, top_ids, top_vals) aligned 1:1 with tokens[slot] — only
        materialized for slots that asked for logprobs (the device
        fetch of the [slots, chunk, 5] alternatives is skipped
        entirely when nobody did)."""
        decode = self.gen._decode_chunk_mixed(
            self.slots, self.chunk, self.sampling)
        self._carry, toks, self._counts, lps, tis, tvs = decode(
            self._params, self._carry, self._temps_dev,
            self._counts_dev(), self._fp_dev, self._pp_dev,
            self._bias_dev())
        lpinfo = {}
        if any(r.want_logprobs is not None
               for r in self._active.values()):
            lps, tis, tvs = (np.asarray(lps), np.asarray(tis),
                             np.asarray(tvs))
            for slot, r in self._active.items():
                if r.want_logprobs is not None:
                    lpinfo[slot] = [(lps[slot, j], tis[slot, j],
                                     tvs[slot, j])
                                    for j in range(lps.shape[1])]
        return np.asarray(toks), lpinfo           # [slots, chunk]

    def _judge_speculation(self):
        """After a probe window, keep speculating only while the EMA
        acceptance clears the verify step's cost premium; otherwise
        hold on the plain program with exponential backoff."""
        self._spec_seen += 1
        if self._spec_seen < self.spec_probe or self._accept_ema is None:
            return
        if self._accept_ema >= self.spec_breakeven:
            self._hold_len = self.spec_hold       # probe succeeded
        else:
            self._spec_mode = False
            self._plain_left = self._hold_len
            self._hold_len = min(self._hold_len * 2, self.spec_hold_max)

    def _sync_ids_buf(self):
        """Rebuild the device token-history buffer from host request
        state before re-entering speculation: plain dispatches emit
        through the ordinary decode program, which doesn't maintain
        `_ids_buf`, but every emitted token lives in `req.tokens` —
        prompt + emissions at positions [0, pos) is exactly what the
        in-program drafting needs."""
        buf = np.full((self.slots, self.cfg.max_seq_len),
                      self.sampling.pad_id, np.int32)
        for slot, req in self._active.items():
            hist = np.concatenate([
                req.ids[:req.length],
                np.asarray(req.tokens[req.consumed:], np.int32)])
            hist = hist[:self.cfg.max_seq_len]
            buf[slot, :len(hist)] = hist
        self._ids_buf = jnp.asarray(buf)

    def _spec_chunk_advance(self) -> dict[int, list[int]]:
        """One scanned device dispatch: `chunk` speculative steps for
        every slot, harvested from the (tokens, valid) matrices. The
        in-program EOS/budget cut guarantees the valid stream for a
        slot is exactly its next emitted tokens (EOS included), so the
        ordinary harvest loop applies unchanged."""
        n_live = len(self._active)
        (self._carry, self._ids_buf, toks, valid, excl, self._counts,
         lps, tis, tvs) = self._spec_chunk_jit(
                self._params, self._carry, self._ids_buf, self._limits,
                self._temps_dev, jnp.asarray(self._excl),
                self._counts_dev(), self._fp_dev, self._pp_dev,
                self._bias_dev(), self._lpf_dev)
        self._excl = np.array(excl)   # copy: jax views are read-only
        toks, valid = np.asarray(toks), np.asarray(valid)
        if self.adaptive and n_live:
            # emitted tokens per slot-step vs the 1/step a plain chunk
            # would emit — the quantity the breakeven compares against
            a = float(valid.sum()) / (self.chunk * n_live)
            self._accept_ema = a if self._accept_ema is None \
                else 0.5 * self._accept_ema + 0.5 * a
        lpinfo = {}
        if any(r.want_logprobs is not None
               for r in self._active.values()):
            lps, tis, tvs = (np.asarray(lps), np.asarray(tis),
                             np.asarray(tvs))
            for slot, r in self._active.items():
                if r.want_logprobs is not None:
                    # logprobs slots never accept drafts (gated into
                    # the sequential lane), so each scan step emits at
                    # most its position-0 token — the one `lps` covers
                    lpinfo[slot] = [(lps[st, slot], tis[st, slot],
                                     tvs[st, slot])
                                    for st in range(toks.shape[0])
                                    if valid[st, slot, 0]]
        return {slot: [int(t) for s in range(toks.shape[0])
                       for t, v in zip(toks[s, slot], valid[s, slot])
                       if v]
                for slot in self._active}, lpinfo

    def _spec_advance(self) -> dict[int, list[int]]:
        """One speculative pool step: host drafts per slot, one verify
        forward for all slots, returns slot → accepted run.

        For greedy slots the host anchors the draft on the same argmax
        the verify program applies to the same carried logits, so both
        sides agree; sampled slots draw their token IN-PROGRAM (the
        host can't replicate the rng draw), so their emitted token is
        the returned t1 and their drafts are ignored (n_acc = 1)."""
        pad = self.sampling.pad_id
        k, n = self.draft_len, self.ngram
        draft = self._draft_fn or _lookup_draft_np
        t1g = np.asarray(self._argmax_jit(self._carry[0]))  # [slots]
        drafts = np.full((self.slots, k), pad, np.int32)
        for slot, req in self._active.items():
            if req.temperature > 0:
                continue                  # drafts unused for sampled
            hist = np.concatenate([
                req.ids[:req.length],
                np.asarray(req.tokens[req.consumed:] + [int(t1g[slot])],
                           np.int32)])
            drafts[slot] = draft(hist, k, n, pad)
        (self._carry, n_acc, t1, self._counts, lp1, lti,
         ltv) = self._verify_jit(
            self._params, self._carry, jnp.asarray(drafts),
            self._temps_dev, self._counts_dev(), self._fp_dev,
            self._pp_dev, self._bias_dev(), self._lpf_dev)
        n_acc, t1 = np.asarray(n_acc), np.asarray(t1)
        lpinfo = {}
        if any(r.want_logprobs is not None
               for r in self._active.values()):
            lp1, lti, ltv = (np.asarray(lp1), np.asarray(lti),
                             np.asarray(ltv))
            for slot, r in self._active.items():
                if r.want_logprobs is not None:
                    # gated to n_acc=1: the only emission is t1
                    lpinfo[slot] = [(lp1[slot], lti[slot], ltv[slot])]
        return {slot: [int(t1[slot])]
                + [int(t) for t in drafts[slot][:n_acc[slot] - 1]]
                for slot in self._active}, lpinfo

    @property
    def busy(self) -> bool:
        return bool(self._queue or self._active or self._prefilling)

    def run(self) -> dict[int, list[int]]:
        """Drive until queue and pool are empty; returns rid → tokens
        for every request ever submitted."""
        while self.busy:
            self.step()
        return {rid: req.tokens for rid, req in self._requests.items()}

    def result(self, rid: int) -> _Request:
        return self._requests[rid]

    @property
    def occupancy(self) -> float:
        return self.stats["occupancy_sum"] / max(self.stats["steps"], 1)


class DeadlineExceeded(TimeoutError):
    """A deadline'd request ran out of wall-clock budget (queue wait +
    decode combined) and was cancelled. `.tokens` holds the partial
    decode — exactly the tokens that streamed before the abort — so
    callers can degrade to a truncated answer instead of nothing."""

    def __init__(self, tokens: list[int], deadline_s: float):
        super().__init__(
            f"decode deadline exceeded ({deadline_s:.3g}s)")
        self.tokens = tokens
        self.deadline_s = deadline_s


class GenerationHandle:
    """A request submitted through `ContinuousDriver.submit`: `result()`
    blocks for the final tokens, `cancel()` aborts it (the slot frees at
    the next step boundary and queued neighbors admit into it), `done()`
    polls. A cancelled request's `result()` returns the tokens emitted
    before the abort — serving uses this for client disconnects, where
    the partial output is exactly what went on the wire."""

    __slots__ = ("_driver", "_evt", "_box", "_ctl")

    def __init__(self, driver, evt, box, ctl):
        self._driver = driver
        self._evt = evt
        self._box = box
        self._ctl = ctl

    def result(self) -> list[int]:
        self._evt.wait()
        return ContinuousDriver._result(self._box)

    def cancel(self) -> bool:
        """Request the abort; returns False if already finished or
        already cancelled. The abort itself lands on the decode thread
        (the engine is single-threaded) — `result()` unblocks once the
        slot is actually released."""
        return self._driver._cancel(self._ctl, self._evt)

    def done(self) -> bool:
        return self._evt.is_set()

    def cancelled(self) -> bool:
        return self._box.get("cancelled", False)

    def timed_out(self) -> bool:
        return self._box.get("timed_out", False)


class ContinuousDriver:
    """Thread-safe front of a ContinuousEngine: concurrent callers
    submit and block (or stream via `on_delta`); ONE driver thread steps
    the engine while any work exists and sleeps otherwise. This is the
    serving integration — each HTTP handler thread calls `generate()`
    and its request joins whatever is already decoding at the next
    chunk boundary (the engine itself is single-threaded).

    Submission is a QUEUE, not a critical section around the engine: an
    earlier design took one lock for both submitting and stepping, and
    the driver loop — release, re-acquire — almost always won the
    unfair race against blocked submitters (a textbook lock convoy: at
    8 concurrent RAG workers the pool averaged ~2 resident requests
    because submissions sat behind ~200 ms device steps). Now callers
    only touch `_sub_lock` for a list append; the driver drains the
    queue between steps, so admission latency is bounded by ONE step,
    never by the convoy."""

    def __init__(self, engine: ContinuousEngine):
        import threading

        self.engine = engine
        self._sub_lock = threading.Lock()   # guards _pending/_cancels/_closed
        self._pending: list[tuple] = []
        self._cancels: list[dict] = []       # ctl dicts awaiting abort
        self._events: dict[int, tuple] = {}  # rid → (evt, box); driver-owned
        self._watch: list[dict] = []         # deadline'd ctls; driver-owned
        self.timeouts = 0                    # deadline aborts (driver-owned)
        self._work = threading.Event()
        self._closed = False
        self._thread = threading.Thread(target=self._loop,
                                        name="continuous-decode",
                                        daemon=True)
        self._thread.start()

    def _submit(self, prompt_ids, length, max_new, on_token, temperature,
                deadline_s=None, priority=0,
                frequency_penalty=0.0, presence_penalty=0.0,
                seed=None, logit_bias=None, logprobs=None):
        import threading

        evt = threading.Event()
        box: dict = {}
        ctl: dict = {"rid": None, "cancelled": False,
                     "seed": seed, "logit_bias": logit_bias,
                     "logprobs": logprobs,
                     "penalties": (float(frequency_penalty),
                                   float(presence_penalty))}
        if deadline_s is not None:
            if not deadline_s > 0:          # rejects 0, <0 AND nan
                raise ValueError(
                    f"deadline_s must be positive, got {deadline_s}")
            # absolute, from SUBMIT time: the budget covers queue wait
            # AND decode, which is the promise a serving deadline makes
            ctl["deadline"] = _time.monotonic() + deadline_s
            ctl["deadline_s"] = float(deadline_s)
        with self._sub_lock:
            if self._closed:
                raise RuntimeError("driver is closed")
            self._pending.append((prompt_ids, length, max_new,
                                  on_token, temperature, evt, box, ctl,
                                  int(priority)))
        self._work.set()
        return evt, box, ctl

    def _cancel(self, ctl: dict, evt) -> bool:
        """Queue an abort for the decode thread. A submission and its
        cancel are appended under the same lock, so the loop's atomic
        snapshot can never see the cancel before the submission — rids
        are always assigned by the time a cancel is processed."""
        if evt.is_set():
            return False
        with self._sub_lock:
            if ctl["cancelled"]:
                return False
            ctl["cancelled"] = True
            self._cancels.append(ctl)
        self._work.set()
        return True

    def submit(self, prompt_ids, length: int, max_new: int,
               on_token=None, temperature: float | None = None,
               deadline_s: float | None = None,
               priority: int = 0,
               frequency_penalty: float = 0.0,
               presence_penalty: float = 0.0,
               logit_bias: dict | None = None,
               seed: int | None = None) -> GenerationHandle:
        """Non-blocking submit; the returned handle can wait for or
        cancel the request (`generate()` is `submit().result()`).
        `deadline_s` bounds queue wait + decode together: an expired
        request is cancelled on the decode thread and its `result()`
        raises `DeadlineExceeded` carrying the partial tokens.
        `priority` orders pool admission (lower first, ties FIFO);
        the penalties are OpenAI-style over completion tokens."""
        evt, box, ctl = self._submit(prompt_ids, length, max_new,
                                     on_token, temperature, deadline_s,
                                     priority, frequency_penalty,
                                     presence_penalty, seed,
                                     logit_bias)
        return GenerationHandle(self, evt, box, ctl)

    def submit_embeds(self, embeds, length: int, max_new: int,
                      on_token=None, temperature: float | None = None,
                      deadline_s: float | None = None,
                      priority: int = 0,
                      frequency_penalty: float = 0.0,
                      presence_penalty: float = 0.0,
                      logit_bias: dict | None = None,
                      seed: int | None = None) -> GenerationHandle:
        """Multimodal `submit`: `embeds` [S, H] is the composed prefix
        (token embeddings + spliced image patches); the request joins
        the SAME slot pool as text traffic (engine.submit_embeds).
        Penalties apply over COMPLETION tokens (the engine's counts
        build from emitted tokens, never the pad-placeholder prompt
        ids), so they mean the same thing as on a text request."""
        evt, box, ctl = self._submit(_EmbedsPrompt(embeds), length,
                                     max_new, on_token, temperature,
                                     deadline_s, priority,
                                     frequency_penalty,
                                     presence_penalty, seed,
                                     logit_bias)
        return GenerationHandle(self, evt, box, ctl)

    def generate_embeds(self, embeds, length: int, max_new: int,
                        on_token=None,
                        temperature: float | None = None,
                        deadline_s: float | None = None,
                        priority: int = 0,
                        frequency_penalty: float = 0.0,
                        presence_penalty: float = 0.0,
                        logit_bias: dict | None = None,
                        seed: int | None = None) -> list[int]:
        """Blocking multimodal generate through the pool."""
        return self.submit_embeds(
            embeds, length, max_new, on_token=on_token,
            temperature=temperature, deadline_s=deadline_s,
            priority=priority, frequency_penalty=frequency_penalty,
            presence_penalty=presence_penalty, logit_bias=logit_bias,
            seed=seed).result()

    def generate_with_logprobs(self, prompt_ids, length: int,
                               max_new: int, logprobs: int = 0,
                               temperature: float | None = None,
                               deadline_s: float | None = None,
                               priority: int = 0,
                               frequency_penalty: float = 0.0,
                               presence_penalty: float = 0.0,
                               logit_bias: dict | None = None,
                               seed: int | None = None
                               ) -> tuple[list[int], list]:
        """`generate` that also returns per-token logprobs:
        [(lp, [(token_id, lp), ...top]) ...] aligned with the tokens.
        `logprobs` = how many top alternatives per token (0..5); the
        chosen token's lp always comes. Logprobs requests decode
        sequentially under speculation (lp extraction happens at the
        position-0 draw), so neighbors keep speculating."""
        evt, box, _ = self._submit(prompt_ids, length, max_new,
                                   None, temperature, deadline_s,
                                   priority, frequency_penalty,
                                   presence_penalty, seed, logit_bias,
                                   int(logprobs))
        evt.wait()
        toks = self._result(box)
        return toks, box.get("logprobs") or []

    @staticmethod
    def _result(box: dict) -> list[int]:
        if "error" in box:
            raise box["error"]
        return box["tokens"]

    def generate(self, prompt_ids, length: int, max_new: int,
                 on_token=None, temperature: float | None = None,
                 deadline_s: float | None = None,
                 priority: int = 0,
                 frequency_penalty: float = 0.0,
                 presence_penalty: float = 0.0,
                 logit_bias: dict | None = None,
                 seed: int | None = None) -> list[int]:
        """Block until this request completes; returns its tokens.
        With `deadline_s`, raises `DeadlineExceeded` (partial tokens on
        the exception) if the budget expires first."""
        evt, box, _ = self._submit(prompt_ids, length, max_new,
                                   on_token, temperature, deadline_s,
                                   priority, frequency_penalty,
                                   presence_penalty, seed,
                                   logit_bias)
        evt.wait()
        return self._result(box)

    def generate_stream(self, prompt_ids, length: int, max_new: int,
                        temperature: float | None = None,
                        deadline_s: float | None = None,
                        priority: int = 0,
                        frequency_penalty: float = 0.0,
                        presence_penalty: float = 0.0,
                        logit_bias: dict | None = None,
                        seed: int | None = None):
        """Yield this request's token ids as the pool decodes them.

        The engine's `on_token` fires on the driver thread; a queue
        bridges to the consumer. Once the request's done event is set no
        further tokens can arrive (the engine emits a request's tokens
        and marks it done inside the same `step()`), so drain-then-stop
        is race-free. The stream joins mid-flight decoding exactly like
        the blocking path — short streams finish without waiting on
        long pool neighbors.

        Closing the generator before exhaustion (a disconnected SSE
        client, `break` + GC) CANCELS the request: its slot frees at
        the next step boundary instead of decoding to max_new into
        nowhere."""
        return self._token_stream(prompt_ids, length, max_new,
                                  temperature, deadline_s, priority,
                                  frequency_penalty, presence_penalty,
                                  seed, logit_bias)

    def generate_embeds_stream(self, embeds, length: int,
                               max_new: int,
                               temperature: float | None = None,
                               deadline_s: float | None = None,
                               priority: int = 0,
                               frequency_penalty: float = 0.0,
                               presence_penalty: float = 0.0,
                               logit_bias: dict | None = None,
                               seed: int | None = None):
        """`generate_stream` for a MULTIMODAL request: the composed
        [S, H] prefix prefills via the embeds program and the stream
        yields token ids as the pool decodes them — same early-close
        cancellation and deadline semantics as the text stream."""
        return self._token_stream(_EmbedsPrompt(embeds), length,
                                  max_new, temperature, deadline_s,
                                  priority, frequency_penalty,
                                  presence_penalty, seed, logit_bias)

    def _token_stream(self, payload, length, max_new, temperature,
                      deadline_s, priority, frequency_penalty,
                      presence_penalty, seed, logit_bias=None):
        import queue as _queue

        q: _queue.Queue = _queue.Queue()
        evt, box, ctl = self._submit(payload, length, max_new,
                                     lambda _rid, t: q.put(t),
                                     temperature, deadline_s, priority,
                                     frequency_penalty,
                                     presence_penalty, seed,
                                     logit_bias)

        def _iter():
            try:
                while not evt.is_set():
                    try:
                        yield q.get(timeout=0.05)
                    except _queue.Empty:
                        continue
                while True:
                    try:
                        yield q.get_nowait()
                    except _queue.Empty:
                        break
                self._result(box)   # surface engine errors to consumers
            finally:
                # abandoned mid-stream (GeneratorExit lands here) —
                # stop paying decode steps for a gone consumer
                if not evt.is_set():
                    self._cancel(ctl, evt)

        return _iter()

    def warm(self, prompt_buckets: tuple[int, ...] | None = None
             ) -> None:
        """Run `engine.warm` ON THE DRIVER THREAD (the engine is
        single-threaded; warming from the caller would race live
        steps). Blocks until done. Call before serving traffic —
        requests admitted while a warm is in flight are served
        correctly but their engine counters land inside the warm's
        snapshot/restore window."""
        import threading

        evt = threading.Event()
        box: dict = {}
        with self._sub_lock:
            if self._closed:
                raise RuntimeError("driver is closed")
            self._pending.append((_WARM, prompt_buckets, None, None,
                                  None, evt, box, None, 0))
        self._work.set()
        evt.wait()
        if "error" in box:
            raise box["error"]

    def close(self):
        with self._sub_lock:
            self._closed = True
        self._work.set()
        self._thread.join(timeout=10)

    def _loop(self):
        while True:
            self._work.wait()
            with self._sub_lock:
                if self._closed:
                    # never strand a caller on evt.wait(): fail every
                    # queued and in-flight request before exiting
                    err = RuntimeError("driver is closed")
                    for item in self._pending:
                        item[6]["error"] = err
                        item[5].set()
                    self._pending.clear()
                    for evt, box in self._events.values():
                        box["error"] = err
                        evt.set()
                    self._events.clear()
                    return
                pending, self._pending = self._pending, []
                cancels, self._cancels = self._cancels, []
            for (ids, length, max_new, on_token, temp,
                 evt, box, ctl, prio) in pending:
                if ids is _WARM:
                    try:
                        self.engine.warm(length)   # length = buckets
                    except Exception as e:
                        box["error"] = e
                    evt.set()
                    continue
                try:
                    fp, pp = ctl.get("penalties", (0.0, 0.0))
                    sub = (functools.partial(self.engine.submit_embeds,
                                             ids.embeds)
                           if isinstance(ids, _EmbedsPrompt)
                           else functools.partial(self.engine.submit,
                                                  ids))
                    rid = sub(length, max_new,
                              on_token=on_token,
                              temperature=temp,
                              priority=prio,
                              frequency_penalty=fp,
                              presence_penalty=pp,
                              logit_bias=ctl.get("logit_bias"),
                              logprobs=ctl.get("logprobs"),
                              seed=ctl.get("seed"))
                    ctl["rid"] = rid
                    self._events[rid] = (evt, box)
                    if "deadline" in ctl:
                        self._watch.append(ctl)
                except Exception as e:           # bad request: fail caller
                    box["error"] = e
                    evt.set()
            for ctl in cancels:
                rid = ctl.get("rid")
                if rid is None or rid not in self._events:
                    continue    # failed submit, or finished first
                self.engine.cancel(rid)
                evt, box = self._events.pop(rid)
                box["cancelled"] = True
                req_done = self.engine._requests[rid]
                box["tokens"] = req_done.tokens
                if req_done.want_logprobs is not None:
                    box["logprobs"] = req_done.logprobs
                evt.set()
            if self._watch:
                # deadline sweep: while any deadline'd request is live
                # the engine is busy, so the loop passes here at least
                # once per step (~one decode step of expiry latency)
                now = _time.monotonic()
                alive = []
                for ctl in self._watch:
                    rid = ctl.get("rid")
                    if rid not in self._events:
                        continue        # finished, cancelled, or failed
                    if now < ctl["deadline"]:
                        alive.append(ctl)
                        continue
                    self.engine.cancel(rid)
                    evt, box = self._events.pop(rid)
                    toks = self.engine._requests[rid].tokens
                    box["timed_out"] = True
                    box["tokens"] = toks
                    box["error"] = DeadlineExceeded(toks,
                                                    ctl["deadline_s"])
                    self.timeouts += 1
                    evt.set()
                self._watch = alive
            if not self.engine.busy:
                # re-check under the lock so a submit (or cancel)
                # racing this branch can't have its work-flag clear
                # swallowed
                with self._sub_lock:
                    if (not self._pending and not self._cancels
                            and not self.engine.busy):
                        self._work.clear()
                continue
            try:
                self.engine.step()
            except Exception as e:
                # a dying device program must not strand callers on
                # evt.wait() forever — fail every in-flight request
                for rid, (evt, box) in self._events.items():
                    box["error"] = e
                    evt.set()
                self._events.clear()
                with self._sub_lock:
                    # submissions queued DURING the failing step must
                    # not strand until some future submit re-sets the
                    # flag — leave it set so the next iteration drains
                    # them (a still-failing engine then fails THEIR
                    # events the same way)
                    if not self._pending and not self._cancels:
                        self._work.clear()
                continue
            for rid, (evt, box) in list(self._events.items()):
                req = self.engine._requests[rid]
                if req.done:
                    if req.error is not None:
                        box["error"] = req.error
                    else:
                        box["tokens"] = req.tokens
                    if req.want_logprobs is not None:
                        box["logprobs"] = req.logprobs
                    evt.set()
                    del self._events[rid]
