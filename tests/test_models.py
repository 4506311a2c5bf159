import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.models import (
    BgeM3Config,
    BgeM3Model,
    CrossEncoderModel,
    EncoderConfig,
    TransformerEncoder,
)
from rag_dpo_tpu.models.convert import (
    convert_cross_encoder_state_dict,
    convert_xlmr_state_dict,
)


def _tiny_inputs(b=3, s=24, vocab=1024, pad=1, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, vocab, size=(b, s)).astype(np.int32)
    lengths = np.array([s, s - 5, 7], dtype=np.int32)[:b]
    for i, L in enumerate(lengths):
        ids[i, L:] = pad
    return jnp.asarray(ids), jnp.asarray(lengths)


def test_encoder_forward_shapes():
    cfg = EncoderConfig.tiny(use_flash_attention=False)
    model = TransformerEncoder(cfg)
    ids, lengths = _tiny_inputs()
    params = model.init(jax.random.key(0), ids, lengths)
    out = model.apply(params, ids, lengths)
    assert out.shape == (3, 24, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_flash_and_reference_attention_agree_in_model():
    ids, lengths = _tiny_inputs(seed=1)
    cfg_ref = EncoderConfig.tiny(use_flash_attention=False)
    cfg_flash = EncoderConfig.tiny(use_flash_attention=True,
                                   flash_block_q=8, flash_block_k=8)
    model_ref = TransformerEncoder(cfg_ref)
    params = model_ref.init(jax.random.key(1), ids, lengths)
    out_ref = model_ref.apply(params, ids, lengths)
    out_flash = TransformerEncoder(cfg_flash).apply(params, ids, lengths)
    # compare valid rows only
    for i, L in enumerate(np.asarray(lengths)):
        np.testing.assert_allclose(
            np.asarray(out_flash)[i, :L], np.asarray(out_ref)[i, :L],
            atol=1e-4, rtol=1e-4,
        )


def test_bge_m3_heads():
    cfg = BgeM3Config.tiny()
    cfg = BgeM3Config(
        encoder=EncoderConfig.tiny(use_flash_attention=False),
        colbert_dim=32,
    )
    model = BgeM3Model(cfg)
    ids, lengths = _tiny_inputs(seed=2)
    params = model.init(jax.random.key(2), ids, lengths)
    out = model.apply(params, ids, lengths)
    assert out.dense.shape == (3, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.dense), axis=1), 1.0, atol=1e-3
    )
    assert out.sparse.shape == (3, 24)
    sp = np.asarray(out.sparse)
    assert (sp >= 0).all()
    assert np.all(sp[2, 7:] == 0)  # padding zeroed
    assert out.colbert.shape == (3, 24, 32)
    cb = np.asarray(out.colbert)
    assert np.all(cb[2, 7:] == 0)
    np.testing.assert_allclose(
        np.linalg.norm(cb[0, :24], axis=-1), 1.0, atol=1e-3
    )


def test_cross_encoder_scores():
    cfg = EncoderConfig.tiny(use_flash_attention=False)
    model = CrossEncoderModel(cfg)
    ids, lengths = _tiny_inputs(seed=3)
    params = model.init(jax.random.key(3), ids, lengths)
    scores = model.apply(params, ids, lengths)
    assert scores.shape == (3,)
    assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.slow
def test_torch_parity_xlmr():
    """Architecture parity: our Flax encoder == HF torch XLMRobertaModel."""
    torch = pytest.importorskip("torch")
    from transformers import XLMRobertaConfig, XLMRobertaModel

    hf_cfg = XLMRobertaConfig(
        vocab_size=512, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=130, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5, position_embedding_type="absolute",
    )
    torch.manual_seed(0)
    hf = XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = EncoderConfig(
        vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=130,
        type_vocab_size=1, pad_token_id=1, use_flash_attention=False,
    )
    flax_params = {"params": convert_xlmr_state_dict(state)}
    flax_params = jax.tree.map(jnp.asarray, flax_params)

    rng = np.random.default_rng(7)
    ids = rng.integers(4, 512, size=(2, 16)).astype(np.int64)
    ids[1, 10:] = 1  # padding
    attn = (ids != 1).astype(np.int64)

    with torch.no_grad():
        ref = hf(torch.tensor(ids),
                 attention_mask=torch.tensor(attn)).last_hidden_state.numpy()

    ours = TransformerEncoder(cfg).apply(
        flax_params, jnp.asarray(ids, jnp.int32)
    )
    ours = np.asarray(ours)
    np.testing.assert_allclose(ours[0], ref[0], atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(ours[1, :10], ref[1, :10], atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_torch_parity_cross_encoder():
    torch = pytest.importorskip("torch")
    from transformers import (
        XLMRobertaConfig,
        XLMRobertaForSequenceClassification,
    )

    hf_cfg = XLMRobertaConfig(
        vocab_size=512, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=130, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        num_labels=1, classifier_dropout=0.0,
    )
    torch.manual_seed(1)
    hf = XLMRobertaForSequenceClassification(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = EncoderConfig(
        vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=130,
        type_vocab_size=1, pad_token_id=1, use_flash_attention=False,
    )
    params = convert_cross_encoder_state_dict(state)
    rng = np.random.default_rng(8)
    ids = rng.integers(4, 512, size=(3, 12)).astype(np.int64)
    attn = np.ones_like(ids)

    with torch.no_grad():
        ref = hf(torch.tensor(ids),
                 attention_mask=torch.tensor(attn)).logits.numpy()[:, 0]

    ours = CrossEncoderModel(cfg).apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(ids, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-3)
