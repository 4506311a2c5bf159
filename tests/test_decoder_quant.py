"""Weight-only int8 decoder: quantized params ≈ float forward."""

import jax
import jax.numpy as jnp
import numpy as np

from rag_dpo_tpu.models.decoder import (
    DecoderConfig,
    DecoderModel,
    quantize_decoder_params,
)


def test_quantized_forward_close_to_float():
    cfg = DecoderConfig.tiny(dtype=jnp.float32)
    model = DecoderModel(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 512, (2, 12)),
                      jnp.int32)
    params = model.init(jax.random.key(0), ids)
    ref = model.apply(params, ids)

    qcfg = DecoderConfig.tiny(dtype=jnp.float32, quantize_weights=True)
    qparams = {"params": quantize_decoder_params(params["params"])}
    qmodel = DecoderModel(qcfg)
    out = qmodel.apply(jax.tree.map(jnp.asarray, qparams), ids)

    ref_np, out_np = np.asarray(ref), np.asarray(out)
    # logits drift from int8 weights but the argmax rarely flips
    agree = np.mean(ref_np.argmax(-1) == out_np.argmax(-1))
    assert agree >= 0.9, agree
    # relative magnitude in range
    corr = np.corrcoef(ref_np.ravel(), out_np.ravel())[0, 1]
    assert corr > 0.99, corr


def test_quantized_param_structure_matches_init():
    qcfg = DecoderConfig.tiny(quantize_weights=True)
    qmodel = DecoderModel(qcfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    init_params = qmodel.init(jax.random.key(0), ids)

    fcfg = DecoderConfig.tiny()
    fparams = DecoderModel(fcfg).init(jax.random.key(0), ids)
    converted = {"params": quantize_decoder_params(fparams["params"])}

    init_shapes = jax.tree.map(lambda x: (x.shape, str(x.dtype)),
                               init_params)
    conv_shapes = jax.tree.map(lambda x: (tuple(np.shape(x)),
                                          str(np.asarray(x).dtype)),
                               converted)
    assert init_shapes == conv_shapes


def test_quantized_generation_runs():
    from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator

    cfg = DecoderConfig.tiny(quantize_weights=True)
    gen = TextGenerator(cfg)
    ids = np.random.default_rng(1).integers(3, 512, (1, 8)).astype(
        np.int32)
    out = gen.generate_ids(ids, np.asarray([8]),
                           SamplingConfig(temperature=0.0,
                                          max_new_tokens=4, eos_id=-1))
    assert out.shape == (1, 4)
