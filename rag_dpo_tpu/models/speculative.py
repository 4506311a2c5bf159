"""Speculative decoding via prompt-lookup drafting — fully on-device.

The reference's generator (Ollama over HTTP, `src/utils/llm_provider.py`)
decodes strictly one token per forward. On TPU a small-batch decode step
is HBM-bound on the *weights*: a forward over k+1 positions reads the
weights exactly once, so verifying k drafted tokens costs barely more
than emitting one. Whenever a draft source predicts runs of upcoming
tokens, throughput multiplies by the accepted-run length.

For RAG the ideal draft source is the prompt itself: grounded answers
quote spans of the retrieved context verbatim (articles, definitions,
deadlines), so *prompt lookup* — find the latest prior occurrence of the
current tail n-gram in the sequence so far and propose the tokens that
followed it — drafts exactly the spans the model is about to copy. No
draft model, no extra weights.

TPU-native design (everything static-shaped, zero host round-trips):

* the whole generate loop is ONE jitted `lax.while_loop`; each iteration
  drafts (vectorized n-gram match over the token buffer), verifies
  (single cached forward over 1+draft_len positions), and accepts the
  longest prefix whose greedy argmax chain matches;
* per-row state (position, emitted count, done) advances by the per-row
  accepted length — rows at different speeds share one program;
* rejected drafts leave K/V rows behind the write pointer; the cache
  scatter overwrites (decoder.py GQAttention), so the next step's write
  at the same positions is exact;
* greedy speculative decoding is *lossless*: the emitted stream is
  bit-identical to `TextGenerator.generate_ids` at temperature 0
  (asserted exhaustively in tests/test_speculative.py).

Sampling (temperature > 0) falls back to the plain decode path — the
acceptance rule for sampled speculative decoding (Leviathan et al.'s
rejection scheme) is out of scope for the serving paths here, which run
the RAG answer at temperature 0/0.1-greedy.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .decoder import DecoderModel
from .generate import SamplingConfig, TextGenerator


@dataclasses.dataclass
class SpecStats:
    steps: int            # verify forwards executed
    tokens: int           # live tokens emitted (pre-pad, incl. EOS)
    rows: int

    @property
    def tokens_per_step(self) -> float:
        return self.tokens / max(self.steps, 1)


def prompt_lookup_draft(ids_buf, cur, k: int, n: int, pad: int = 1):
    """Vectorized prompt-lookup (jax-traceable): ids_buf [B, L] (valid
    < cur, including the just-written greedy token); returns [B, k] —
    the tokens that followed the latest strictly-earlier occurrence of
    the tail n-gram, or pad when the n-gram never occurred before."""
    L = ids_buf.shape[1]
    pat_idx = cur[:, None] - n + jnp.arange(n)[None, :]
    pattern = jnp.take_along_axis(
        ids_buf, jnp.clip(pat_idx, 0, L - 1), axis=1)       # [B, n]
    nw = L - n + 1
    windows = jnp.stack(
        [ids_buf[:, i:i + nw] for i in range(n)], axis=-1)
    match = jnp.all(windows == pattern[:, None, :], axis=-1)
    j_pos = jnp.arange(nw)[None, :]
    match = match & (j_pos < cur[:, None] - n)  # strictly earlier
    has = jnp.any(match, axis=1)
    j_star = jnp.argmax(jnp.where(match, j_pos, -1), axis=1)
    src = j_star[:, None] + n + jnp.arange(k)[None, :]
    looked = jnp.take_along_axis(
        ids_buf, jnp.clip(src, 0, L - 1), axis=1)           # [B, k]
    return jnp.where(has[:, None], looked, pad)


class SpeculativeGenerator:
    """Greedy prompt-lookup speculative decoding over a TextGenerator.

    draft_len: tokens proposed per verify step (the verify forward runs
        1 + draft_len positions).
    ngram: match length for the prompt lookup (2 is the PLD standard:
        long enough to anchor, short enough to fire often).
    """

    def __init__(self, generator: TextGenerator, *, draft_len: int = 7,
                 ngram: int = 2, draft_fn=None):
        """draft_fn(ids_buf [B, L], cur [B]) -> [B, draft_len] overrides
        the prompt-lookup draft source (must be jax-traceable; `cur` is
        the valid length INCLUDING the just-emitted greedy token).
        Greedy speculative decoding is draft-agnostic — any source is
        lossless — so this hook exists for oracle/benchmark drafts and
        alternative heuristics, not correctness."""
        assert ngram >= 1 and draft_len >= 1
        self.gen = generator
        self.cfg = generator.config
        self.draft_len = int(draft_len)
        self.ngram = int(ngram)
        self._draft_fn = draft_fn or self.lookup_draft
        self._programs: dict = {}

    def lookup_draft(self, ids_buf, cur):
        """Prompt-lookup at this generator's draft_len/ngram (see
        module-level prompt_lookup_draft — the pad value only fills
        no-match drafts; any value is lossless under greedy verify)."""
        return prompt_lookup_draft(ids_buf, cur, self.draft_len,
                                   self.ngram)

    # ------------------------------------------------------------ program
    def _spec_loop(self, b: int, s: int, max_new: int,
                   sampling: SamplingConfig):
        key = (b, s, max_new, sampling.eos_id, sampling.pad_id)
        if key in self._programs:
            return self._programs[key]

        cfg = self.cfg
        k = self.draft_len
        eos, pad = sampling.eos_id, sampling.pad_id
        L = s + max_new + k          # token buffer length
        model = self.gen.model
        draft = self._draft_fn

        @jax.jit
        def spec(params, first_logits, caches, prompt_ids, lengths):
            ids_buf = jnp.concatenate(
                [prompt_ids,
                 jnp.full((b, L - s), pad, jnp.int32)], axis=1)
            out_buf = jnp.full((b, max_new), pad, jnp.int32)

            def cond(c):
                _, _, _, _, _, n_emit, done, _ = c
                return jnp.any(~done & (n_emit < max_new))

            def body(c):
                (logits, caches, ids_buf, out_buf, cur, n_emit, done,
                 steps) = c
                live = ~done & (n_emit < max_new)
                t1 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                # t1 is unconditionally correct under greedy — write it
                # into the buffer so the tail n-gram includes it
                oh_t1 = jax.nn.one_hot(cur, L, dtype=jnp.int32) \
                    * live[:, None].astype(jnp.int32)
                ids_buf = ids_buf * (1 - oh_t1) + oh_t1 * t1[:, None]
                drafts = draft(ids_buf, cur + 1)        # [B, k]
                inputs = jnp.concatenate([t1[:, None], drafts], axis=1)
                positions = cur[:, None] + jnp.arange(1 + k)[None, :]
                wmask = live[:, None] & (positions < cfg.max_seq_len)
                pos_c = jnp.clip(positions, 0, cfg.max_seq_len - 1)
                logits_all, caches = model.apply(
                    params, inputs, pos_c, caches,
                    attn_mask=None, write_mask=wmask,
                )                                       # [B, 1+k, V]
                g = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)
                # draft i (input index i ≥ 1) is accepted iff every
                # earlier draft matched AND it equals the greedy argmax
                # after input i-1
                ok = inputs[:, 1:] == g[:, :-1]         # [B, k]
                acc = jnp.cumprod(ok.astype(jnp.int32), axis=1)
                n_acc = 1 + jnp.sum(acc, axis=1)        # ∈ [1, 1+k]
                idx = jnp.arange(1 + k)[None, :]
                base = (idx < n_acc[:, None]) & live[:, None] \
                    & (n_emit[:, None] + idx < max_new)
                is_eos = (inputs == eos) & base
                after_eos = (jnp.cumsum(is_eos.astype(jnp.int32),
                                        axis=1) - is_eos) > 0
                valid = base & ~after_eos               # EOS emitted too
                nv = jnp.sum(valid.astype(jnp.int32), axis=1)

                # scatter emitted tokens into out_buf at n_emit + i
                tgt = n_emit[:, None] + idx
                oh = jax.nn.one_hot(
                    jnp.where(valid, tgt, max_new), max_new,
                    dtype=jnp.int32)                    # [B, 1+k, M]
                cov = jnp.sum(oh, axis=1)
                out_buf = out_buf * (1 - cov) + jnp.einsum(
                    "bim,bi->bm", oh, inputs)
                # accepted drafts also extend ids_buf (t1 already there)
                tgt_ids = cur[:, None] + idx
                oh_ids = jax.nn.one_hot(
                    jnp.where(valid & (idx > 0), tgt_ids, L), L,
                    dtype=jnp.int32)
                cov_ids = jnp.sum(oh_ids, axis=1)
                ids_buf = ids_buf * (1 - cov_ids) + jnp.einsum(
                    "bim,bi->bm", oh_ids, inputs)

                # logits after the LAST emitted token feed the next step
                new_logits = jnp.take_along_axis(
                    logits_all,
                    jnp.clip(nv - 1, 0)[:, None, None], axis=1)[:, 0]
                logits = jnp.where(live[:, None], new_logits, logits)
                cur = cur + nv
                n_emit = n_emit + nv
                done = done | jnp.any(is_eos & valid, axis=1) \
                    | (n_emit >= max_new)
                return (logits, caches, ids_buf, out_buf, cur, n_emit,
                        done, steps + jnp.any(live).astype(jnp.int32))

            init = (first_logits, caches, ids_buf, out_buf, lengths,
                    jnp.zeros((b,), jnp.int32), jnp.zeros((b,), bool),
                    jnp.int32(0))
            final = jax.lax.while_loop(cond, body, init)
            return final[3], final[5], final[7]   # out_buf, n_emit, steps

        self._programs[key] = spec
        return spec

    # ------------------------------------------------------------- public
    def generate_ids(self, input_ids: np.ndarray, lengths: np.ndarray,
                     sampling: SamplingConfig | None = None,
                     ) -> tuple[np.ndarray, SpecStats]:
        """[B, S] padded prompts → ([B, max_new] ids, SpecStats).

        Greedy only (temperature 0) — bit-identical to
        TextGenerator.generate_ids; temperature > 0 delegates to it.
        """
        sampling = sampling or SamplingConfig()
        if sampling.temperature > 0:
            out = self.gen.generate_ids(input_ids, lengths, sampling)
            return out, SpecStats(steps=int(sampling.max_new_tokens),
                                  tokens=0, rows=out.shape[0])
        params = self.gen.load()
        b, s = input_ids.shape
        max_new = sampling.max_new_tokens
        assert s + max_new + self.draft_len <= self.cfg.max_seq_len, (
            "prompt + generation + draft window exceeds max_seq_len")
        first_logits, caches = self.gen._prefill(b, s)(
            params, jnp.asarray(input_ids), jnp.asarray(lengths))
        out, n_emit, steps = self._spec_loop(b, s, max_new, sampling)(
            params, first_logits, caches,
            jnp.asarray(input_ids, jnp.int32),
            jnp.asarray(lengths, jnp.int32))
        return np.asarray(out), SpecStats(
            steps=int(steps), tokens=int(np.asarray(n_emit).sum()),
            rows=b)
