"""Speculative decoding economics at 12B int8 on one v5e chip.

Three measurements bracket what prompt-lookup speculation is worth:

1. plain greedy decode (the baseline the serving paths use today);
2. the VERIFY-STEP COST RATIO — wall time of one (1+k)-position cached
   forward vs one 1-token decode step. Decode is HBM-bound on weights,
   so this ratio is the whole economics: accepted-run length a yields
   end-to-end speedup ≈ a / ratio;
3. ORACLE-draft speculative decode (draft = the model's own greedy
   continuation): the full-acceptance upper bound — what real weights
   approach when the answer quotes retrieved context, the standard RAG
   situation (grounded answers copy article spans verbatim);
4. prompt-LOOKUP speculative decode on random weights: the honest
   floor — random-init argmax chains almost never follow the prompt, so
   acceptance ~1 and this mainly measures the lookup+loop overhead.

Run on the real chip:  python benchmarks/bench_speculative.py
"""

import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator
from rag_dpo_tpu.models.speculative import SpeculativeGenerator

PROMPT = 128
MAX_NEW = 128
K = 7          # draft length → verify forwards run 8 positions


def time_call(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = DecoderConfig.mistral_nemo_12b()
    cfg = dataclasses.replace(cfg, quantize_weights=True,
                              tie_embeddings=True,
                              max_seq_len=PROMPT + MAX_NEW + K + 1,
                              param_dtype=jnp.bfloat16)
    gen = TextGenerator(cfg)
    t0 = time.time()
    gen.load()
    print(f"12B int8 loaded in {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    prompts = rng.integers(3, cfg.vocab_size,
                           (batch, PROMPT)).astype(np.int32)
    lengths = np.full((batch,), PROMPT, np.int32)
    sampling = SamplingConfig(temperature=0.0, eos_id=-1, pad_id=1,
                              max_new_tokens=MAX_NEW)
    out = {"bench": "speculative_decode_12B_int8",
           "device": str(jax.devices()[0]), "batch": batch,
           "prompt_tokens": PROMPT, "max_new": MAX_NEW, "draft_len": K}

    # ---- 1. plain greedy baseline
    gen.generate_ids(prompts, lengths, sampling)            # compile
    wall = time_call(lambda: gen.generate_ids(prompts, lengths,
                                              sampling))
    tok = batch * MAX_NEW
    out["plain"] = {"wall_s": round(wall, 3),
                    "tok_per_s": round(tok / wall, 1),
                    "ms_per_step": round(wall / MAX_NEW * 1e3, 3)}
    print(f"plain: {wall:.3f}s, {tok / wall:.0f} tok/s", flush=True)

    # ---- 2. verify-step cost ratio (amortized inside chunked scans:
    # a K_CHUNK-iteration scan of (1+K)-position forwards vs the same
    # scan of 1-token steps — isolates device cost from dispatch)
    params = gen.load()
    first_logits, caches = gen._prefill(batch, PROMPT)(
        params, jnp.asarray(prompts), jnp.asarray(lengths))
    CH = 16
    decode = gen._decode_chunk(batch, CH, sampling)
    carry = (first_logits, caches, jnp.asarray(lengths),
             jnp.zeros((batch,), bool),
             jnp.zeros((batch,), jnp.uint32))
    carry2, _ = decode(params, carry)                       # compile
    jax.block_until_ready(carry2[0])
    t1 = time_call(lambda: jax.block_until_ready(
        decode(params, carry)[0][0]))
    step_ms = t1 / CH * 1e3

    verify_model = gen.model

    @jax.jit
    def verify_chain(params, logits0, caches):
        def step(c, _):
            logits, caches = c
            t1_tok = jnp.argmax(logits, -1).astype(jnp.int32)
            inputs = jnp.tile(t1_tok[:, None], (1, 1 + K))
            pos = PROMPT + jnp.zeros((batch, 1 + K), jnp.int32) \
                + jnp.arange(1 + K)[None, :]
            la, caches = verify_model.apply(params, inputs, pos, caches)
            return (la[:, -1], caches), ()

        (l, c), _ = jax.lax.scan(step, (logits0, caches), None,
                                 length=CH)
        return l

    jax.block_until_ready(verify_chain(params, first_logits, caches))
    t2 = time_call(lambda: jax.block_until_ready(
        verify_chain(params, first_logits, caches)))
    verify_ms = t2 / CH * 1e3
    ratio = verify_ms / step_ms
    out["verify_cost"] = {
        "decode_step_ms": round(step_ms, 3),
        "verify_step_ms": round(verify_ms, 3),
        "ratio": round(ratio, 3),
        "breakeven_accept": round(ratio, 2),
        "speedup_at_full_accept": round((1 + K) / ratio, 2)}
    print(f"decode step {step_ms:.2f} ms, verify(1+{K}) {verify_ms:.2f}"
          f" ms → ratio {ratio:.2f}, full-accept speedup "
          f"{(1 + K) / ratio:.2f}x", flush=True)

    # ---- 3. oracle drafts: the full-acceptance upper bound
    plain_out = gen.generate_ids(prompts, lengths, sampling)
    oracle = jnp.asarray(plain_out, jnp.int32)
    jl = jnp.asarray(lengths)

    def oracle_draft(ids_buf, cur):
        n_emit = cur - jl - 1
        src = n_emit[:, None] + 1 + jnp.arange(K)[None, :]
        return jnp.take_along_axis(
            oracle, jnp.clip(src, 0, MAX_NEW - 1), axis=1)

    spec_o = SpeculativeGenerator(gen, draft_len=K,
                                  draft_fn=oracle_draft)
    o_out, o_stats = spec_o.generate_ids(prompts, lengths, sampling)
    exact = bool(np.array_equal(o_out, plain_out))
    wall_o = time_call(
        lambda: spec_o.generate_ids(prompts, lengths, sampling))
    out["oracle"] = {
        "wall_s": round(wall_o, 3),
        "tok_per_s": round(tok / wall_o, 1),
        "tokens_per_step": round(o_stats.tokens_per_step / batch, 2),
        "bit_exact_vs_plain": exact,
        "speedup_vs_plain": round(out["plain"]["wall_s"] / wall_o, 2)}
    print(f"oracle: {wall_o:.3f}s, {tok / wall_o:.0f} tok/s "
          f"({out['oracle']['speedup_vs_plain']}x, "
          f"accept {o_stats.tokens_per_step / batch:.2f}/step, "
          f"exact={exact})", flush=True)

    # ---- 4. prompt lookup on random weights (honest floor)
    spec_l = SpeculativeGenerator(gen, draft_len=K, ngram=2)
    l_out, l_stats = spec_l.generate_ids(prompts, lengths, sampling)
    exact_l = bool(np.array_equal(l_out, plain_out))
    wall_l = time_call(
        lambda: spec_l.generate_ids(prompts, lengths, sampling))
    out["lookup_random_weights"] = {
        "wall_s": round(wall_l, 3),
        "tok_per_s": round(tok / wall_l, 1),
        "tokens_per_step": round(l_stats.tokens_per_step / batch, 2),
        "bit_exact_vs_plain": exact_l}
    print(f"lookup(random): {wall_l:.3f}s, accept "
          f"{l_stats.tokens_per_step / batch:.2f}/step, "
          f"exact={exact_l}", flush=True)

    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
