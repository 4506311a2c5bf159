"""HF checkpoint → quantized decoder params end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.models.decoder import (
    DecoderConfig,
    DecoderModel,
    quantize_decoder_params,
)


@pytest.mark.slow
def test_hf_to_quantized_decoder():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from rag_dpo_tpu.models.convert import convert_llama_state_dict

    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    hf = LlamaForCausalLM(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    float_params = convert_llama_state_dict(state)
    q_params = {"params": jax.tree.map(
        jnp.asarray, quantize_decoder_params(float_params))}

    cfg = DecoderConfig(
        vocab_size=256, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, rope_theta=10000.0,
        max_seq_len=64, dtype=jnp.float32, quantize_weights=True,
    )
    ids = np.random.default_rng(5).integers(3, 256, (2, 10)).astype(
        np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    ours = DecoderModel(cfg).apply(q_params, jnp.asarray(ids, jnp.int32))
    # int8 weights: argmax agreement + high correlation, not exactness
    agree = np.mean(ref.argmax(-1) == np.asarray(ours).argmax(-1))
    assert agree >= 0.85, agree
    corr = np.corrcoef(ref.ravel(), np.asarray(ours).ravel())[0, 1]
    assert corr > 0.98, corr
