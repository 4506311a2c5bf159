import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.models.decoder import DecoderConfig, DecoderModel
from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator
from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider


def _model(**kw):
    cfg = DecoderConfig.tiny(**kw)
    model = DecoderModel(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.key(0), ids)
    return cfg, model, params


def test_forward_shapes():
    cfg, model, params = _model()
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 512, (2, 16)),
                      jnp.int32)
    logits = model.apply(params, ids)
    assert logits.shape == (2, 16, 512)
    assert np.isfinite(np.asarray(logits)).all()


def test_kv_cache_matches_full_forward():
    """prefill + step-by-step decode == full causal forward."""
    cfg, model, params = _model()
    rng = np.random.default_rng(1)
    b, s = 2, 10
    ids = jnp.asarray(rng.integers(3, 512, (b, s)), jnp.int32)

    full_logits = model.apply(params, ids)  # [B, S, V]

    caches = DecoderModel.init_cache(cfg, b)
    # prefill the first 6 tokens, then decode 4 more one at a time
    pre = 6
    positions = jnp.broadcast_to(jnp.arange(pre)[None, :], (b, pre))
    logits, caches = model.apply(
        params, ids[:, :pre], positions, caches,
        write_mask=jnp.ones((b, pre), bool),
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :pre]),
        atol=2e-2, rtol=2e-2,
    )
    for t in range(pre, s):
        pos = jnp.full((b, 1), t, jnp.int32)
        step_logits, caches = model.apply(
            params, ids[:, t : t + 1], pos, caches)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, t]),
            atol=2e-2, rtol=2e-2,
        )


def test_padded_prefill_does_not_pollute():
    """Rows with shorter prompts: pad tokens must not affect decoding."""
    cfg, model, params = _model()
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 512, (1, 5)).astype(np.int32)

    gen = TextGenerator(cfg, params=params)
    sampling = SamplingConfig(temperature=0.0, max_new_tokens=4,
                              eos_id=-1)
    # exact prompt
    out_a = gen.generate_ids(prompt, np.asarray([5]), sampling)
    # same prompt padded to 12 with junk beyond length
    padded = np.concatenate(
        [prompt, rng.integers(3, 512, (1, 7)).astype(np.int32)], axis=1)
    out_b = gen.generate_ids(padded, np.asarray([5]), sampling)
    np.testing.assert_array_equal(out_a, out_b)


def test_generation_deterministic_greedy_and_eos():
    cfg, model, params = _model()
    gen = TextGenerator(cfg, params=params)
    rng = np.random.default_rng(3)
    ids = rng.integers(3, 512, (2, 8)).astype(np.int32)
    lengths = np.asarray([8, 5])
    sampling = SamplingConfig(temperature=0.0, max_new_tokens=6, eos_id=-1)
    a = gen.generate_ids(ids, lengths, sampling)
    b = gen.generate_ids(ids, lengths, sampling)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 6)
    # sampling path runs and differs from greedy sometimes
    s2 = SamplingConfig(temperature=1.0, max_new_tokens=6, eos_id=-1)
    c = gen.generate_ids(ids, lengths, s2, rng_seed=7)
    assert c.shape == (2, 6)


def test_tpu_llm_provider_mechanics():
    llm = TPULLMProvider(max_new_tokens=8)
    resp = llm.generate("Question de test RGPD ?")
    assert resp.ok
    assert resp.duration >= 0
    # chat path via default BaseLLMProvider flattening
    resp2 = llm.chat([{"role": "system", "content": "s"},
                      {"role": "user", "content": "u"}])
    assert resp2.error is None


@pytest.mark.slow
def test_torch_parity_llama():
    """Architecture parity vs HF LlamaForCausalLM (random tiny weights)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    from rag_dpo_tpu.models.convert import convert_llama_state_dict

    cfg = DecoderConfig(
        vocab_size=256, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, rope_theta=10000.0,
        max_seq_len=64, dtype=jnp.float32,
    )
    params = {"params": jax.tree.map(
        jnp.asarray, convert_llama_state_dict(state))}

    rng = np.random.default_rng(4)
    ids = rng.integers(3, 256, (2, 12)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    ours = DecoderModel(cfg).apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3,
                               rtol=2e-3)


def test_generate_stream_matches_generate_ids():
    """Chunked streaming must be bit-identical to the one-shot decode
    (same rng threading), and stop early once every row hit EOS."""
    import jax.numpy as jnp
    import numpy as np

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.models.generate import (
        SamplingConfig,
        TextGenerator,
    )

    cfg = DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                             dtype=jnp.float32)
    gen = TextGenerator(cfg)
    rng = np.random.default_rng(3)
    ids = rng.integers(3, 512, (2, 10)).astype(np.int32)
    lengths = np.asarray([10, 6])

    s = SamplingConfig(temperature=0.0, max_new_tokens=13, eos_id=-1)
    want = gen.generate_ids(ids, lengths, s)
    got = np.concatenate(list(gen.generate_stream(ids, lengths, s,
                                                  chunk=4)), axis=1)
    assert got.shape == want.shape
    assert np.array_equal(got, want)

    # sampled path: identical rng threading → identical stream
    s2 = SamplingConfig(temperature=0.8, max_new_tokens=12, eos_id=-1)
    want2 = gen.generate_ids(ids, lengths, s2, rng_seed=7)
    got2 = np.concatenate(list(gen.generate_stream(
        ids, lengths, s2, rng_seed=7, chunk=5)), axis=1)
    assert np.array_equal(got2, want2)

    # early stop (single row so all-done is reachable): the row's own
    # first greedy token as EOS stops the stream at the first chunk
    first = int(want[0, 0])
    s3 = SamplingConfig(temperature=0.0, max_new_tokens=64, eos_id=first)
    chunks = list(gen.generate_stream(ids[:1], lengths[:1], s3,
                                      chunk=4))
    total = sum(c.shape[1] for c in chunks)
    assert total == 4, "stream must stop after the all-EOS chunk"
