"""scripts/convert_weights.py end-to-end over a tiny real HF snapshot."""

import importlib.util
import pathlib
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "convert_weights", "/root/repo/scripts/convert_weights.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_convert_decoder_snapshot_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=64,
        rope_theta=10000.0, attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    snapshot = tmp_path / "snap"
    hf.save_pretrained(snapshot, safe_serialization=False)

    out = tmp_path / "decoder.npz"
    r = subprocess.run(
        [sys.executable, "scripts/convert_weights.py", "decoder",
         str(snapshot), str(out)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr

    mod = _load_script()
    params = jax.tree.map(jnp.asarray, mod.load_params_npz(out))

    from rag_dpo_tpu.models.decoder import DecoderConfig, DecoderModel

    cfg = DecoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, rope_theta=10000.0,
        max_seq_len=64, dtype=jnp.float32,
    )
    ids = np.random.default_rng(0).integers(3, 128, (2, 8)).astype(
        np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    ours = DecoderModel(cfg).apply(params, jnp.asarray(ids, jnp.int32))
    # torch(oneDNN) vs XLA-CPU accumulation-order noise (the npz
    # roundtrip itself is bit-lossless — verified separately); the
    # meaningful checks are tight-absolute closeness + argmax identity
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-2)
    agree = np.mean(ref.argmax(-1) == np.asarray(ours).argmax(-1))
    assert agree == 1.0


_XLMR_KW = dict(
    vocab_size=512, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=130, type_vocab_size=1, pad_token_id=1,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    layer_norm_eps=1e-5, position_embedding_type="absolute",
)


def _encoder_cfg():
    from rag_dpo_tpu.models import EncoderConfig

    return EncoderConfig(
        vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=130,
        type_vocab_size=1, pad_token_id=1, use_flash_attention=False,
    )


def _run_convert(kind, snapshot, out):
    r = subprocess.run(
        [sys.executable, "scripts/convert_weights.py", kind,
         str(snapshot), str(out)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    mod = _load_script()
    return jax.tree.map(jnp.asarray, mod.load_params_npz(out))


@pytest.mark.slow
def test_convert_bge_m3_snapshot_roundtrip(tmp_path):
    """`convert_weights.py bge-m3` end-to-end over a real HF snapshot
    layout: XLMRobertaModel (with pooler, like BAAI/bge-m3's export) +
    FlagEmbedding's `sparse_linear.pt` / `colbert_linear.pt` sidecars —
    the one-command real-weights recipe for the retrieval encoder
    (VERDICT round-2 item 3; model role:
    /root/reference/src/utils/embedding_provider.py:79-105)."""
    torch = pytest.importorskip("torch")
    from transformers import XLMRobertaConfig, XLMRobertaModel

    torch.manual_seed(2)
    hf = XLMRobertaModel(XLMRobertaConfig(**_XLMR_KW)).eval()
    snapshot = tmp_path / "snap"
    hf.save_pretrained(snapshot, safe_serialization=False)
    torch.manual_seed(3)
    sparse = torch.nn.Linear(32, 1).eval()
    colbert = torch.nn.Linear(32, 16).eval()
    torch.save(sparse.state_dict(), snapshot / "sparse_linear.pt")
    torch.save(colbert.state_dict(), snapshot / "colbert_linear.pt")

    params = _run_convert("bge-m3", snapshot, tmp_path / "bge.npz")

    from rag_dpo_tpu.models import BgeM3Config, BgeM3Model

    cfg = BgeM3Config(encoder=_encoder_cfg(), colbert_dim=16)
    rng = np.random.default_rng(5)
    ids = rng.integers(4, 512, size=(2, 12)).astype(np.int64)
    ids[1, 9:] = 1  # padding
    attn = (ids != 1).astype(np.int64)
    with torch.no_grad():
        h = hf(torch.tensor(ids),
               attention_mask=torch.tensor(attn)).last_hidden_state
        ref_dense = torch.nn.functional.normalize(
            h[:, 0], dim=-1).numpy()
        mask = attn.astype(np.float32)
        ref_sparse = torch.relu(sparse(h)[..., 0]).numpy() * mask
        ref_colbert = (torch.nn.functional.normalize(
            colbert(h), dim=-1).numpy() * mask[:, :, None])

    ours = BgeM3Model(cfg).apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours.dense), ref_dense,
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ours.sparse), ref_sparse,
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ours.colbert), ref_colbert,
                               atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_convert_reranker_snapshot_roundtrip(tmp_path):
    """`convert_weights.py reranker` end-to-end over a real HF
    sequence-classification snapshot (Jina-reranker-v2-class XLM-RoBERTa
    architecture; VERDICT round-2 item 3; model role:
    /root/reference/src/rag/reranker.py:74-108)."""
    torch = pytest.importorskip("torch")
    from transformers import (
        XLMRobertaConfig,
        XLMRobertaForSequenceClassification,
    )

    torch.manual_seed(4)
    hf = XLMRobertaForSequenceClassification(XLMRobertaConfig(
        num_labels=1, classifier_dropout=0.0, **_XLMR_KW)).eval()
    snapshot = tmp_path / "snap"
    hf.save_pretrained(snapshot, safe_serialization=False)

    params = _run_convert("reranker", snapshot, tmp_path / "rr.npz")

    from rag_dpo_tpu.models import CrossEncoderModel

    rng = np.random.default_rng(6)
    ids = rng.integers(4, 512, size=(3, 12)).astype(np.int64)
    ids[2, 8:] = 1  # padding
    attn = (ids != 1).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids),
                 attention_mask=torch.tensor(attn)).logits.numpy()[:, 0]
    ours = CrossEncoderModel(_encoder_cfg()).apply(
        params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref,
                               atol=2e-4, rtol=2e-3)


def test_convert_llava_snapshot_roundtrip(tmp_path):
    """kind=llava: HF LlavaForConditionalGeneration snapshot →
    scripts/convert_weights.py → load → full multimodal logits parity.
    Closes the converter-recipe loop for the vision stack the way the
    decoder/bge-m3/reranker kinds already are."""
    torch = pytest.importorskip("torch")
    from transformers import (CLIPVisionConfig, LlamaConfig,
                              LlavaConfig as HFLlavaConfig,
                              LlavaForConditionalGeneration)

    vis = CLIPVisionConfig(
        image_size=28, patch_size=7, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, hidden_act="quick_gelu",
        attention_dropout=0.0, layer_norm_eps=1e-5)
    txt = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=64,
        rms_norm_eps=1e-5, rope_theta=10000.0, attention_bias=False,
        tie_word_embeddings=False)
    hf_cfg = HFLlavaConfig(
        vision_config=vis, text_config=txt, image_token_index=127,
        projector_hidden_act="gelu", vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(hf_cfg).eval()
    snapshot = tmp_path / "snap"
    hf.save_pretrained(snapshot, safe_serialization=False)

    out = tmp_path / "llava.npz"
    r = subprocess.run(
        [sys.executable, "scripts/convert_weights.py", "llava",
         str(snapshot), str(out)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr

    mod = _load_script()
    tree = mod.load_params_npz(out)["params"]

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.models.generate import TextGenerator
    from rag_dpo_tpu.models.llava import LlavaConfig, LlavaGenerator
    from rag_dpo_tpu.models.vit import ViTConfig

    cfg = LlavaConfig(
        vision=ViTConfig.tiny(dtype=jnp.float32),
        text=DecoderConfig(
            vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=64, rope_theta=10000.0,
            max_seq_len=64, dtype=jnp.float32,
            param_dtype=jnp.float32))
    gen = TextGenerator(cfg.text)
    lg = LlavaGenerator(cfg, generator=gen)
    lg.load_converted(tree)

    rng = np.random.default_rng(2)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    pre = rng.integers(3, 100, (2,)).astype(np.int64)
    post = rng.integers(3, 100, (3,)).astype(np.int64)
    ids = np.concatenate(
        [pre, np.full((16,), 127, np.int64), post])[None]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(pixels)).logits.numpy()

    from rag_dpo_tpu.models.decoder import DecoderModel

    img_embeds = lg.encode_image(pixels)
    pre_e = gen.embed_ids(pre[None])[0]
    post_e = gen.embed_ids(post[None])[0]
    embeds = np.concatenate(
        [pre_e, np.asarray(img_embeds[0], pre_e.dtype), post_e],
        axis=0)[None]
    ours = DecoderModel(cfg.text).apply(
        gen.load(), jnp.zeros(embeds.shape[:2], jnp.int32),
        inputs_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-2)
    agree = np.mean(ref.argmax(-1) == np.asarray(ours).argmax(-1))
    assert agree == 1.0
