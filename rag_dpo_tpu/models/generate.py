"""KV-cached text generation: jitted prefill + scanned decode loop.

Static shapes throughout: prompts pad to a bucket, the KV cache is
pre-allocated at max_seq_len, and the decode loop is one `lax.scan` of
`max_new_tokens` steps with per-row stop handling (finished rows keep
emitting pad — the scan shape never changes).
"""

from __future__ import annotations

import dataclasses
import functools
import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .decoder import DecoderConfig, DecoderModel


@dataclasses.dataclass
class SamplingConfig:
    temperature: float = 0.0      # 0 = greedy
    top_k: int = 40
    top_p: float = 1.0            # nucleus cutoff within the top-k (1 = off)
    max_new_tokens: int = 256
    eos_id: int = 2
    pad_id: int = 1


def mix_seed(a: int, b: int) -> int:
    """Deterministic 32-bit mix (golden-ratio / Murmur odd constants,
    each a bijection mod 2³²): the default per-row / per-request
    sampling seed when the caller doesn't pass one — distinct rows and
    distinct base seeds land on distinct streams without any shared
    rng state to thread or lock."""
    return ((a * 0x9E3779B9) ^ (b * 0x85EBCA6B)) & 0xFFFFFFFF


def default_row_seeds(rng_seed: int, b: int) -> np.ndarray:
    """Per-row seeds for a batched decode given one call-level seed:
    co-batched rows sample INDEPENDENT streams (an identical prompt
    twice in one batch draws two different generations) while the call
    stays reproducible from `rng_seed` alone."""
    return np.asarray([mix_seed(rng_seed, r) for r in range(b)],
                      np.uint32)


def step_keys(seeds, pos, tag: int):
    """Per-row draw keys for POSITION-KEYED sampling: key_i =
    fold_in(fold_in(key(seeds[i]), pos[i]), tag).

    Every decode program family (direct, chunked, mixed pool, the
    speculative verify and scanned-spec paths) derives its draws this
    way, which makes a sampled stream a pure function of
    (seed, position): independent of batch neighbors, of chunk
    boundaries, of WHEN a request joined the continuous pool, and of
    scheduler mode switches — and bit-reproducible across recompute
    preemption (the resumed slot re-derives the same keys at the same
    positions). `tag` separates multiple draws at one position
    (0 = the token draw, 1 = speculative-sampling accept uniforms)."""
    def one(s, p):
        return jax.random.fold_in(
            jax.random.fold_in(jax.random.key(s), p), tag)
    return jax.vmap(one)(seeds, pos)


def topk_topp_sample(logits, temps, rng, top_k: int, top_p: float,
                     exclude=None):
    """Top-k then nucleus draw with PER-ROW temperature; rows with
    temps ≤ 0 return the argmax (bit-identical to greedy decode, so
    greedy and sampled requests share one program). logits [B, V].

    `rng` is either ONE key (the whole batch draws from one stream —
    the legacy scalar form) or a [B] key ARRAY (position-keyed
    sampling: row i's draw depends only on its own key — see
    `step_keys`). Both use the same gumbel-argmax scheme
    `jax.random.categorical` implements.

    Nucleus rule: keep the smallest prefix of the (descending) top-k
    whose mass reaches `top_p` — a token stays iff the mass BEFORE it
    is < top_p, so the first token always survives.

    `exclude` [B] (optional): per-row token id masked out WITHIN the
    kept set — the residual draw of speculative sampling (the rejected
    draft's mass removed, remaining kept-set probs renormalized by the
    softmax). -1 (or None) excludes nothing; the kept set itself is
    computed BEFORE the exclusion so the support stays exactly
    `target kept-set minus the rejected token` (re-truncating after
    the mask would leak the (k+1)-th token in)."""
    if not 0.0 < top_p <= 1.0:
        raise ValueError(f"top_p must be in (0, 1], got {top_p}")
    kk = min(int(top_k), logits.shape[-1])
    vals, idxs = jax.lax.top_k(logits, kk)          # sorted desc
    safe = jnp.where(temps > 0, temps, 1.0)[:, None]
    scaled = vals / safe
    if top_p < 1.0:
        probs = jax.nn.softmax(scaled, axis=-1)
        before = jnp.cumsum(probs, axis=-1) - probs
        # the first position has before=0 < top_p for any valid top_p,
        # but keep it structurally anyway (an all(-inf) row would make
        # categorical silently return index 0 — degenerate greedy)
        keep = (before < top_p) | \
            (jnp.arange(kk)[None, :] == 0)
        scaled = jnp.where(keep, scaled, -jnp.inf)
    if exclude is not None:
        scaled = jnp.where(idxs == exclude[:, None], -jnp.inf, scaled)
    if jnp.ndim(rng) >= 1:
        # batched per-row keys: per-row gumbel noise, same argmax
        # scheme as categorical — masked (-inf) entries stay unpicked
        # because gumbel noise is finite
        g = jax.vmap(lambda k: jax.random.gumbel(k, (kk,)))(rng)
        choice = jnp.argmax(scaled + g, axis=-1)
    else:
        choice = jax.random.categorical(rng, scaled, axis=-1)
    drawn = jnp.take_along_axis(idxs, choice[:, None], axis=1)[:, 0]
    return jnp.where(temps > 0, drawn,
                     idxs[:, 0]).astype(jnp.int32)


def apply_penalties(logits, counts, freqs, pres, bias=None):
    """OpenAI-style logit adjustment: logits − freq·count −
    pres·1[count>0] (counts over completion tokens) + bias (static
    per-request `logit_bias` rows, [b, V] or None). Zero penalties
    and zero bias are bitwise no-ops (x − 0.0 ≡ x ≡ x + 0.0), so one
    program serves adjusted and plain traffic. Shared by the plain
    chunked, scanned speculative, and host-verify programs — one fix
    site."""
    out = logits - freqs[:, None] * counts \
        - pres[:, None] * (counts > 0)
    if bias is not None:
        out = out + bias
    return out


LOGPROB_TOPK = 5   # static top-k alternatives emitted with logprobs
#                    (OpenAI caps top_logprobs higher, but every extra
#                    column rides every dispatch; 5 covers the API's
#                    common use and stays noise-sized)


def sampling_logprobs(pl, temps, token):
    """Per-row logprob of `token` [b] plus the top-LOGPROB_TOPK (ids,
    values) under the sampling distribution: log-softmax of the
    adjusted logits `pl` [b, V], temperature-scaled (greedy rows use
    temp 1), over the FULL vocab — pre top-k/top-p truncation (vLLM's
    logprobs convention)."""
    scaled = pl / jnp.where(temps > 0, temps, 1.0)[:, None]
    ls = jax.nn.log_softmax(scaled, axis=-1)
    lp = jnp.take_along_axis(ls, token[:, None], axis=1)[:, 0]
    tv, ti = jax.lax.top_k(ls, LOGPROB_TOPK)
    return lp, ti.astype(jnp.int32), tv


def penalized_rows(freqs, pres):
    """Rows whose target distribution depends on the run's own earlier
    tokens — parallel draft verification is unsound for them, so the
    speculative paths pin n_acc=1. NEGATIVE penalties count too (they
    reshape the distribution just as much as positive ones)."""
    return (freqs != 0) | (pres != 0)


def truncated_token_prob(logits, temps, tokens, top_k: int,
                         top_p: float):
    """Probability `topk_topp_sample` assigns to `tokens` [B] under
    `logits` [B, V] — softmax over the temperature-scaled kept set
    (top-k ∩ nucleus), 0 for tokens outside it. This is the target-
    side acceptance probability of speculative sampling with a
    deterministic (prompt-lookup) draft: accept d with prob p(d),
    else resample with d excluded — the emitted marginal is exactly
    p (Leviathan et al.'s rejection scheme with a point-mass q).
    Works over the kk-sized top-k only: never materializes [B, V]."""
    kk = min(int(top_k), logits.shape[-1])
    vals, idxs = jax.lax.top_k(logits, kk)
    safe = jnp.where(temps > 0, temps, 1.0)[:, None]
    scaled = vals / safe
    if top_p < 1.0:
        p0 = jax.nn.softmax(scaled, axis=-1)
        before = jnp.cumsum(p0, axis=-1) - p0
        keep = (before < top_p) | (jnp.arange(kk)[None, :] == 0)
        scaled = jnp.where(keep, scaled, -jnp.inf)
    probs = jax.nn.softmax(scaled, axis=-1)        # kept-set dist
    match = (idxs == tokens[:, None])
    return jnp.sum(jnp.where(match, probs, 0.0), axis=-1)


class TextGenerator:
    """Host wrapper around the jitted prefill/decode programs."""

    def __init__(self, config: DecoderConfig, params=None,
                 rng_seed: int = 0):
        self.config = config
        self.model = DecoderModel(config)
        self._params = params
        self._rng_seed = rng_seed
        self._programs: dict = {}
        # bound concurrent score_choices dispatches: each holds a
        # k-broadcast KV transient (~180 MB at 12B after the length
        # bound); 16 serving workers firing choose at once next to a
        # loaded slot pool exhausted HBM (measured, bench_e2e run 2)
        self._choose_slots = threading.Semaphore(2)
        self._choose_batcher = None   # see enable_choose_batching

    def load(self):
        if self._params is None:
            ids = jnp.zeros((1, 8), jnp.int32)
            self._params = self.model.init(
                jax.random.key(self._rng_seed), ids)
        return self._params

    def load_converted(self, state_dict):
        from .convert import convert_llama_state_dict

        params = convert_llama_state_dict(state_dict)
        if self.config.quantize_weights:
            # the module tree uses QuantDense (kernel_q + scale): float
            # kernels from the converter must quantize or the first
            # apply raises ScopeParamNotFound (review finding)
            from .decoder import quantize_decoder_params

            params = quantize_decoder_params(params)
        self._params = {"params": jax.tree.map(jnp.asarray, params)}

    def load_converted_tree(self, params: dict):
        """Install an ALREADY-converted DecoderModel param tree (e.g.
        the `decoder` entry of `convert_llava_state_dict`), applying
        the same quantization rule as `load_converted`."""
        if self.config.quantize_weights:
            from .decoder import quantize_decoder_params

            params = quantize_decoder_params(params)
        self._params = {"params": jax.tree.map(jnp.asarray, params)}

    # ----------------------------------------------------------- programs
    def _prefill(self, b: int, s: int):
        key = ("prefill", b, s)
        if key not in self._programs:
            cfg = self.config

            @jax.jit
            def prefill(params, ids, lengths):
                caches = DecoderModel.init_cache(cfg, ids.shape[0])
                positions = jnp.broadcast_to(
                    jnp.arange(ids.shape[1])[None, :], ids.shape)
                valid = positions < lengths[:, None]
                # LM head projected only at each row's last valid token
                # (logits [B, 1, V], not [B, S, V] — see DecoderModel)
                logits, caches = self.model.apply(
                    params, ids, positions, caches,
                    attn_mask=None, write_mask=valid,
                    last_index=jnp.clip(lengths - 1, 0),
                )
                return logits[:, 0], caches

            self._programs[key] = prefill
        return self._programs[key]

    def _prefill_embeds(self, b: int, s: int):
        """Prefill from caller-supplied hidden states instead of token
        ids — the multimodal path (models/llava.py splices projected
        image-patch embeddings between prompt-token embeddings; the
        reference's equivalent traffic goes to an Ollama LLaVA
        endpoint, classify_images.py:45-70)."""
        key = ("prefill_embeds", b, s)
        if key not in self._programs:
            cfg = self.config

            @jax.jit
            def prefill(params, embeds, lengths):
                caches = DecoderModel.init_cache(cfg, embeds.shape[0])
                ids = jnp.zeros(embeds.shape[:2], jnp.int32)
                positions = jnp.broadcast_to(
                    jnp.arange(embeds.shape[1])[None, :],
                    embeds.shape[:2])
                valid = positions < lengths[:, None]
                logits, caches = self.model.apply(
                    params, ids, positions, caches,
                    attn_mask=None, write_mask=valid,
                    last_index=jnp.clip(lengths - 1, 0),
                    inputs_embeds=embeds,
                )
                return logits[:, 0], caches

            self._programs[key] = prefill
        return self._programs[key]

    def embed_ids(self, ids: np.ndarray) -> np.ndarray:
        """Token ids → embedding rows (the decoder's own table), for
        building multimodal prefixes on the host side."""
        params = self.load()
        key = "embed_ids"
        if key not in self._programs:
            @jax.jit
            def embed(params, ids):
                table = params["params"]["embed_tokens"]["embedding"]
                return jnp.take(table, ids, axis=0)

            self._programs[key] = embed
        return np.asarray(self._programs[key](
            params, jnp.asarray(np.asarray(ids, np.int32))))

    def generate_with_embeds(self, embeds: np.ndarray,
                             lengths: np.ndarray,
                             sampling: SamplingConfig | None = None,
                             rng_seed: int = 0,
                             rng_seeds=None) -> np.ndarray:
        """[B, S, H] prefix embeddings (tokens + spliced image patches)
        → [B, max_new_tokens] generated ids. Decode programs are the
        SAME cached ones the text path uses — only the prefill
        differs."""
        sampling = sampling or SamplingConfig()
        params = self.load()
        b, s = embeds.shape[:2]
        assert s + sampling.max_new_tokens <= self.config.max_seq_len
        assert int(np.max(lengths)) <= s, "lengths exceed prefix width"
        first_logits, caches = self._prefill_embeds(b, s)(
            params, jnp.asarray(embeds), jnp.asarray(lengths))
        seeds = default_row_seeds(rng_seed, b) if rng_seeds is None \
            else np.asarray(rng_seeds).astype(np.uint32)
        tokens = self._decode(b, sampling.max_new_tokens, sampling)(
            params, first_logits, caches, jnp.asarray(lengths),
            jnp.asarray(seeds),
        )
        return np.asarray(tokens)

    def _extend(self, b: int, s: int):
        """Continue a prefill from a cached prefix: write K/V for `s`
        suffix positions starting at `start` into an existing cache and
        return the logits at each row's last valid suffix token. One
        program per suffix bucket — `start` is a traced scalar, so any
        prefix length reuses it (serving/continuous.py prefix cache)."""
        key = ("extend", b, s)
        if key not in self._programs:
            cfg = self.config

            @functools.partial(jax.jit, donate_argnums=(4,))
            def extend(params, ids, start, suffix_len, caches):
                offs = jnp.arange(ids.shape[1])[None, :]
                positions = start[:, None] + offs
                valid = (offs < suffix_len[:, None]) & \
                    (positions < cfg.max_seq_len)
                pos_c = jnp.clip(positions, 0, cfg.max_seq_len - 1)
                logits, caches = self.model.apply(
                    params, ids, pos_c, caches,
                    attn_mask=None, write_mask=valid,
                    last_index=jnp.clip(suffix_len - 1, 0),
                )
                return logits[:, 0], caches

            self._programs[key] = extend
        return self._programs[key]

    def _choose(self, b: int, k: int, s: int, c: int):
        """Teacher-forced candidate scoring: prefill `b` prompts ONCE,
        broadcast each prompt's K/V prefix to its `k` candidate rows,
        run one teacher-forced forward over the `c`-token candidate
        bucket, and sum each candidate's next-token log-probs →
        [b, k]. Constrained decoding the TPU way — no token-by-token
        masking loop, no sampling: ranking k continuations costs one
        prefill + one extend, whatever k; `b` concurrent callers share
        both weight sweeps (see enable_choose_batching).

        Log-probs come from a logsumexp + gather rather than a full
        log_softmax so the [b·k, c, V] logits tensor is read twice but
        never copied — at 12B (V=131k) a normalized copy is another
        ~130 MB per (k·c) row-token."""
        key = ("choose", b, k, s, c)
        if key not in self._programs:
            cfg = self.config
            # cache bounded to the rows this program writes (s prompt
            # + c candidate) — NOT max_seq_len: attention reads kv_len
            # from the cache shape, and the k-broadcast of a full-
            # context cache was a ~1 GB transient at 12B that OOMed
            # next to a loaded serving pool
            cache_len = min(s + c, cfg.max_seq_len)

            @jax.jit
            def choose(params, prompt_ids, prompt_len, cand_ids,
                       cand_lens):
                # prompt_ids [b, s], prompt_len [b],
                # cand_ids [b, k, c], cand_lens [b, k]
                caches = DecoderModel.init_cache(cfg, b,
                                                 length=cache_len)
                positions = jnp.broadcast_to(
                    jnp.arange(s)[None, :], (b, s))
                valid = positions < prompt_len[:, None]
                logits1, caches = self.model.apply(
                    params, prompt_ids, positions, caches,
                    attn_mask=None, write_mask=valid,
                    last_index=jnp.clip(prompt_len - 1, 0))
                cachesK = jax.tree_util.tree_map(
                    lambda x: jnp.reshape(
                        jnp.broadcast_to(x[:, None],
                                         (b, k) + x.shape[1:]),
                        (b * k,) + x.shape[1:]),
                    caches)
                cflat = cand_ids.reshape(b * k, c)
                lflat = cand_lens.reshape(b * k)
                plen = jnp.repeat(prompt_len, k)            # [b·k]
                offs = jnp.arange(c)[None, :]
                posC = plen[:, None] + offs
                validC = (offs < lflat[:, None]) & \
                    (posC < cache_len)
                pos_c = jnp.clip(posC, 0, cache_len - 1)
                logitsC, _ = self.model.apply(
                    params, cflat, pos_c, cachesK,
                    attn_mask=None, write_mask=validC)
                l1 = logits1[:, 0].astype(jnp.float32)      # [b, V]
                lp1 = l1 - jax.nn.logsumexp(l1, axis=-1,
                                            keepdims=True)
                first = jnp.take_along_axis(
                    jnp.repeat(lp1, k, axis=0),
                    cflat[:, :1], axis=1)[:, 0]             # [b·k]
                lC = logitsC.astype(jnp.float32)            # [b·k, c, V]
                lse = jax.nn.logsumexp(lC, axis=-1)         # [b·k, c]
                tgt = jnp.take_along_axis(
                    lC[:, :-1], cflat[:, 1:, None],
                    axis=-1)[..., 0]                        # [b·k, c-1]
                nxt = tgt - lse[:, :-1]
                jmask = (jnp.arange(c - 1)[None, :] + 1) \
                    < lflat[:, None]
                out = first + jnp.where(jmask, nxt, 0.0).sum(-1)
                return out.reshape(b, k)

            self._programs[key] = choose
        return self._programs[key]

    def score_choices(self, prompt_ids: np.ndarray, prompt_len: int,
                      cand_ids: np.ndarray,
                      cand_lens: np.ndarray) -> np.ndarray:
        """Sum log-prob of each candidate continuation [k, c] after the
        shared prompt [s] (true length `prompt_len`). Shapes are
        bucketed (k → pow2, s/c → length buckets) so repeated calls hit
        cached programs; pad rows score garbage and are sliced away.
        With `enable_choose_batching`, concurrent same-bucket callers
        coalesce into ONE device dispatch (see _choose_batch_fn)."""
        from ..tokenize.base import bucket_length

        params = self.load()
        prompt_ids = np.asarray(prompt_ids, np.int32).reshape(-1)
        cand_ids = np.asarray(cand_ids, np.int32)
        cand_lens = np.asarray(cand_lens, np.int32)
        k, c = cand_ids.shape
        kb = 1
        while kb < k:
            kb *= 2
        s = bucket_length(len(prompt_ids))
        cb = bucket_length(c, buckets=(4, 8, 16, 32, 64, 128))
        pad = getattr(self.config, "pad_id", 1)
        pids = np.full((s,), pad, np.int32)
        pids[:len(prompt_ids)] = prompt_ids[:s]
        cids = np.full((kb, cb), pad, np.int32)
        cids[:k, :c] = cand_ids[:, :cb]
        lens = np.ones((kb,), np.int32)
        lens[:k] = np.clip(cand_lens, 1, cb)
        plen = min(int(prompt_len), s)
        if self._choose_batcher is not None:
            # pack one flat int32 row [s | 1 | kb·cb | kb]; same-bucket
            # rows stack into one program call by the MicroBatcher
            row = np.concatenate([
                pids, np.asarray([plen], np.int32),
                cids.reshape(-1), lens])
            (out,) = self._choose_batcher(row[None, :], key=(kb, s, cb))
            return np.asarray(out)[0, :k]
        with self._choose_slots:
            out = self._choose(1, kb, s, cb)(
                params, jnp.asarray(pids[None, :]),
                jnp.asarray([plen], dtype=jnp.int32),
                jnp.asarray(cids[None]), jnp.asarray(lens[None]))
            return np.asarray(out)[0, :k]

    def enable_choose_batching(self, max_batch: int = 4,
                               max_wait_ms: float = 2.0) -> None:
        """Coalesce concurrent score_choices calls into batched device
        dispatches. Under concurrent serving (16 workers, intent_fast)
        or background classifier floods (relevance filter, doc nature),
        choose calls otherwise serialize at batch 1 — the two weight
        sweeps amortize across however many callers share the window.
        `max_batch` bounds the prefix-broadcast transient: each row
        holds a k-row KV broadcast (~180 MB at 12B, k=8, bf16 KV), so
        4 rows ≈ 720 MB peak next to the slot pool. Idempotent."""
        if self._choose_batcher is not None:
            return
        from ..serving.batcher import MicroBatcher

        self._choose_batcher = MicroBatcher(
            self._choose_batch_fn, max_batch=max_batch,
            max_wait_ms=max_wait_ms)

    def warm_choose(self, k: int, s: int, c: int) -> None:
        """Pre-compile choose programs for the (k, s, c) bucket at
        every batch size the batcher can produce (pow2s up to its
        max_batch; just b=1 unbatched). A first-shape Mosaic compile
        through the axon remote path can stall a production intent
        call for minutes — warm BEFORE serving traffic, like
        warm_decoder for the slot pool."""
        from ..tokenize.base import bucket_length

        params = self.load()
        kb = 1
        while kb < k:
            kb *= 2
        s = bucket_length(s)
        cb = bucket_length(c, buckets=(4, 8, 16, 32, 64, 128))
        bs = [1]
        if self._choose_batcher is not None:
            b = 1
            while b < self._choose_batcher.max_batch:
                b *= 2
                bs.append(b)
        pad = getattr(self.config, "pad_id", 1)
        for b in bs:
            out = self._choose(b, kb, s, cb)(
                params,
                jnp.full((b, s), pad, jnp.int32),
                jnp.ones((b,), jnp.int32),
                jnp.full((b, kb, cb), pad, jnp.int32),
                jnp.ones((b, kb), jnp.int32))
            np.asarray(out)

    def _choose_batch_fn(self, stacked: np.ndarray, key):
        """MicroBatcher fn: unpack [B, s+1+kb·(cb+1)] rows, pad B to a
        power of two (bounded program count), run the batched choose
        program, return per-row scores [B, kb]."""
        kb, s, cb = key
        q = stacked.shape[0]
        b = 1
        while b < q:
            b *= 2
        if b > q:  # replicate row 0: real shapes, results sliced off
            stacked = np.concatenate(
                [stacked, np.repeat(stacked[:1], b - q, axis=0)])
        pids = stacked[:, :s]
        plens = stacked[:, s]
        cids = stacked[:, s + 1:s + 1 + kb * cb].reshape(b, kb, cb)
        lens = stacked[:, s + 1 + kb * cb:].reshape(b, kb)
        params = self.load()
        with self._choose_slots:
            out = self._choose(b, kb, s, cb)(
                params, jnp.asarray(pids),
                jnp.asarray(plens, dtype=jnp.int32),
                jnp.asarray(cids), jnp.asarray(lens))
            return (np.asarray(out)[:q],)

    def _decode(self, b: int, n_steps: int, sampling: SamplingConfig):
        key = ("decode", b, n_steps, sampling.temperature,
               sampling.top_k, sampling.top_p, sampling.eos_id,
               sampling.pad_id)
        if key not in self._programs:
            cfg = self.config
            temp = sampling.temperature
            top_k, top_p = sampling.top_k, sampling.top_p
            eos = sampling.eos_id
            pad = sampling.pad_id

            def sample(logits, seeds, pos):
                if temp <= 0:
                    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
                temps = jnp.full((logits.shape[0],), temp, jnp.float32)
                return topk_topp_sample(logits, temps,
                                        step_keys(seeds, pos, 0),
                                        top_k, top_p)

            @functools.partial(jax.jit, donate_argnums=(2,))
            def decode(params, first_logits, caches, lengths, seeds):
                def step(carry, _):
                    logits, caches, pos, done, seeds = carry
                    token = sample(logits, seeds, pos)
                    token = jnp.where(done, pad, token)
                    done = done | (token == eos)
                    new_logits, caches = self.model.apply(
                        params, token[:, None], pos[:, None], caches,
                    )
                    return (new_logits[:, 0], caches, pos + 1, done,
                            seeds), token

                init = (first_logits, caches, lengths,
                        jnp.zeros((first_logits.shape[0],), bool), seeds)
                _, tokens = jax.lax.scan(step, init, None,
                                         length=n_steps)
                return tokens.T  # [B, n_steps]

            self._programs[key] = decode
        return self._programs[key]

    def _decode_chunk(self, b: int, n_steps: int,
                      sampling: SamplingConfig):
        """Like _decode but returns the carry too, so successive chunks
        continue exactly where the previous one stopped (streaming)."""
        key = ("decode_chunk", b, n_steps, sampling.temperature,
               sampling.top_k, sampling.top_p, sampling.eos_id,
               sampling.pad_id)
        if key not in self._programs:
            temp, top_k = sampling.temperature, sampling.top_k
            top_p = sampling.top_p
            eos, pad = sampling.eos_id, sampling.pad_id

            def sample(logits, seeds, pos):
                if temp <= 0:
                    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
                temps = jnp.full((logits.shape[0],), temp, jnp.float32)
                return topk_topp_sample(logits, temps,
                                        step_keys(seeds, pos, 0),
                                        top_k, top_p)

            @functools.partial(jax.jit, donate_argnums=(1,))
            def decode(params, carry):
                def step(c, _):
                    logits, caches, pos, done, seeds = c
                    token = sample(logits, seeds, pos)
                    token = jnp.where(done, pad, token)
                    done = done | (token == eos)
                    new_logits, caches = self.model.apply(
                        params, token[:, None], pos[:, None], caches,
                    )
                    return (new_logits[:, 0], caches, pos + 1, done,
                            seeds), token

                carry, tokens = jax.lax.scan(step, carry, None,
                                             length=n_steps)
                return carry, tokens.T

            self._programs[key] = decode
        return self._programs[key]

    def _decode_chunk_mixed(self, b: int, n_steps: int,
                            sampling: SamplingConfig):
        """_decode_chunk with PER-ROW temperatures: `temps[b] <= 0`
        rows decode greedily, others sample from the top-k at their own
        temperature — one program serves a pool mixing both
        (serving/continuous.py). top_k/eos/pad stay static per program.

        `counts [b, V] / freqs [b] / pres [b]` carry OpenAI-style
        frequency/presence penalties: logits' = logits − freq·count −
        pres·1[count>0] over COMPLETION tokens (vLLM semantics), with
        the count update riding the scan; `biases [b, V]` adds the
        static per-request `logit_bias` rows. Zero penalties/bias are
        a bitwise no-op (x − 0.0 ≡ x), so unadjusted pools pay only
        the [b, V] elementwise adjustments — noise next to the weight
        sweep — and one program serves both.

        Besides tokens the program emits per-step LOGPROBS: the chosen
        token's log-probability and the top-`LOGPROB_TOPK` (ids,
        values) under the sampling distribution — log-softmax of the
        penalty/bias-adjusted, temperature-scaled logits over the FULL
        vocab (pre top-k/top-p truncation, vLLM's convention). The
        extra cost is one [b, V] log-softmax per step — noise next to
        the weight sweep — so every request pays it and none recompile
        when a logprobs request joins."""
        key = ("decode_chunk_mixed", b, n_steps, sampling.top_k,
               sampling.top_p, sampling.eos_id, sampling.pad_id)
        if key not in self._programs:
            top_k, top_p = sampling.top_k, sampling.top_p
            eos, pad = sampling.eos_id, sampling.pad_id

            @functools.partial(jax.jit, donate_argnums=(1, 3))
            def decode(params, carry, temps, counts, freqs, pres,
                       biases):
                rowi = jnp.arange(b)

                def step(c, _):
                    logits, caches, pos, done, seeds, counts = c
                    pl = apply_penalties(logits, counts, freqs, pres,
                                         biases)
                    token = topk_topp_sample(pl, temps,
                                             step_keys(seeds, pos, 0),
                                             top_k, top_p)
                    token = jnp.where(done, pad, token)
                    lp, ti, tv = sampling_logprobs(pl, temps, token)
                    counts = counts.at[rowi, token].add(
                        jnp.where(done, 0.0, 1.0))
                    done = done | (token == eos)
                    new_logits, caches = self.model.apply(
                        params, token[:, None], pos[:, None], caches,
                    )
                    return (new_logits[:, 0], caches, pos + 1, done,
                            seeds, counts), (token, lp, ti, tv)

                logits, caches, pos, done, seeds = carry
                (logits, caches, pos, done, seeds, counts), \
                    (tokens, lps, tis, tvs) = jax.lax.scan(
                        step,
                        (logits, caches, pos, done, seeds, counts),
                        None, length=n_steps)
                return (logits, caches, pos, done, seeds), tokens.T, \
                    counts, lps.T, jnp.swapaxes(tis, 0, 1), \
                    jnp.swapaxes(tvs, 0, 1)

            self._programs[key] = decode
        return self._programs[key]

    # ------------------------------------------------------------ public
    def generate_stream(self, input_ids: np.ndarray,
                        lengths: np.ndarray,
                        sampling: SamplingConfig | None = None,
                        rng_seed: int = 0, chunk: int = 8,
                        rng_seeds=None):
        """Yield [B, ≤chunk] token blocks as they decode. Greedy streams
        are bit-identical to generate_ids; sampled streams are too
        (position-keyed draws make chunking invisible); stops early
        once every row has emitted EOS. `rng_seeds` [B] pins per-row
        sampling seeds (else they derive from `rng_seed` + row)."""
        sampling = sampling or SamplingConfig()
        params = self.load()
        b, s = input_ids.shape
        assert s + sampling.max_new_tokens <= self.config.max_seq_len
        assert int(np.max(lengths)) <= s, "lengths exceed prompt width"
        seeds = default_row_seeds(rng_seed, b) if rng_seeds is None \
            else np.asarray(rng_seeds).astype(np.uint32)
        first_logits, caches = self._prefill(b, s)(
            params, jnp.asarray(input_ids), jnp.asarray(lengths))
        carry = (first_logits, caches, jnp.asarray(lengths),
                 jnp.zeros((b,), bool), jnp.asarray(seeds))
        emitted = 0
        while emitted < sampling.max_new_tokens:
            n = min(chunk, sampling.max_new_tokens - emitted)
            carry, tokens = self._decode_chunk(b, n, sampling)(
                params, carry)
            emitted += n
            tokens = np.asarray(tokens)
            yield tokens
            if bool(np.asarray(carry[3]).all()):
                return

    def generate_ids(self, input_ids: np.ndarray, lengths: np.ndarray,
                     sampling: SamplingConfig | None = None,
                     rng_seed: int = 0, rng_seeds=None) -> np.ndarray:
        """[B, S] padded prompts → [B, max_new_tokens] generated ids
        (pad_id after each row's EOS). Sampled rows draw position-keyed
        per-row streams: `rng_seeds` [B] pins them per request (the
        serving layer threads per-request seeds through here), else
        they derive from `rng_seed` + row index — co-batched identical
        prompts sample independently either way."""
        sampling = sampling or SamplingConfig()
        params = self.load()
        b, s = input_ids.shape
        assert s + sampling.max_new_tokens <= self.config.max_seq_len, (
            "prompt + generation exceeds max_seq_len"
        )
        # the in-place DUS cache write CLAMPS an overflowing window
        # (the old one-hot scatter silently dropped it) — a lying
        # `lengths` would corrupt the final rows instead of no-oping,
        # so reject it here
        assert int(np.max(lengths)) <= s, "lengths exceed prompt width"
        first_logits, caches = self._prefill(b, s)(
            params, jnp.asarray(input_ids), jnp.asarray(lengths))
        seeds = default_row_seeds(rng_seed, b) if rng_seeds is None \
            else np.asarray(rng_seeds).astype(np.uint32)
        tokens = self._decode(b, sampling.max_new_tokens, sampling)(
            params, first_logits, caches, jnp.asarray(lengths),
            jnp.asarray(seeds),
        )
        return np.asarray(tokens)
