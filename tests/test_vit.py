"""ViT vision tower: torch parity + LLaVA feature selection.

The reference's vision calls go to an Ollama LLaVA endpoint
(`/root/reference/src/processing/classify_images.py:45-70`); the
TPU-native replacement needs its CLIP tower to match HF exactly so
real LLaVA checkpoints load losslessly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.models.convert import convert_clip_vision_state_dict
from rag_dpo_tpu.models.vit import ViTConfig, ViTModel, preprocess_image


def _hf_tiny():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        image_size=28, patch_size=7, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, hidden_act="quick_gelu",
        attention_dropout=0.0, layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    return torch, hf


def test_torch_parity_clip_vision():
    torch, hf = _hf_tiny()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = ViTConfig.tiny(dtype=jnp.float32)
    params = {"params": jax.tree.map(
        jnp.asarray, convert_clip_vision_state_dict(state))}

    rng = np.random.default_rng(3)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        out = hf(torch.tensor(pixels), output_hidden_states=True)
        # HF applies post_layernorm only to the pooled CLS;
        # last_hidden_state is the bare encoder output
        ref_post = hf.vision_model.post_layernorm(
            out.last_hidden_state).numpy()
    ref_last = out.last_hidden_state.numpy()
    ref_penult = out.hidden_states[-2].numpy()     # LLaVA's feature

    ours_last = np.asarray(ViTModel(cfg).apply(
        params, jnp.asarray(pixels), output_layer=cfg.num_layers))
    np.testing.assert_allclose(ours_last, ref_last, atol=2e-4,
                               rtol=2e-3)

    ours_post = np.asarray(ViTModel(cfg).apply(
        params, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours_post, ref_post, atol=2e-4,
                               rtol=2e-3)

    ours_penult = np.asarray(ViTModel(cfg).apply(
        params, jnp.asarray(pixels),
        output_layer=cfg.num_layers - 1))
    np.testing.assert_allclose(ours_penult, ref_penult, atol=2e-4,
                               rtol=2e-3)


def test_preprocess_image_shapes_and_range():
    img = (np.linspace(0, 255, 40 * 52 * 3)
           .reshape(40, 52, 3).astype(np.uint8))
    out = preprocess_image(img, 28)
    assert out.shape == (3, 28, 28)
    assert out.dtype == np.float32
    # CLIP normalization maps [0,1] into roughly [-1.8, 2.2]
    assert -2.5 < out.min() < out.max() < 2.7

    pil = pytest.importorskip("PIL.Image")
    im = pil.fromarray(img)
    out2 = preprocess_image(im, 28)
    assert out2.shape == (3, 28, 28)
