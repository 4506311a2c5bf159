"""CLIP-class vision transformer (the LLaVA vision tower), TPU-native.

Reference parity: the reference's image understanding goes through an
Ollama LLaVA endpoint (`/root/reference/src/processing/
classify_images.py:45-70` — SCHEMA_DPO / INFOGRAPHIE / PHOTO_DECO
vision classification; `process_and_chunk.py` uses the same endpoint
for the infographic-PDF description fallback). This module is the
on-chip replacement's eye: a CLIP-ViT-L/14-336-class tower whose
patch features feed the multimodal projector (`models/llava.py`) and
then the resident decoder — no external vision service.

TPU notes: the patch embedding is one big [N_patches, 3·P²] × [3·P²,
H] matmul (XLA lowers the stride-P conv to exactly that; we write the
matmul directly so the layout is explicit), attention is bidirectional
over 577 tokens — small enough that the plain fused softmax attention
is MXU-bound, no flash kernel needed — and everything runs bf16 with
f32 layernorm statistics like the text encoder.

Weight layout matches `convert_clip_vision_state_dict`
(models/convert.py) — HF `CLIPVisionModel` torch exports load
losslessly; parity vs torch is pinned by tests/test_vit.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @classmethod
    def clip_vit_l_336(cls, **kw) -> "ViTConfig":
        """openai/clip-vit-large-patch14-336 — LLaVA-1.5's tower."""
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "ViTConfig":
        defaults = dict(image_size=28, patch_size=7, hidden_size=32,
                        num_layers=2, num_heads=4, intermediate_size=64)
        defaults.update(kw)
        return cls(**defaults)


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class ViTAttention(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h, nh = cfg.hidden_size, cfg.num_heads
        dh = h // nh
        dense = lambda name: nn.Dense(
            h, use_bias=True, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)
        b, s, _ = x.shape
        q = dense("q_proj")(x).reshape(b, s, nh, dh)
        k = dense("k_proj")(x).reshape(b, s, nh, dh)
        v = dense("v_proj")(x).reshape(b, s, nh, dh)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32),
            k.astype(jnp.float32)) / (dh ** 0.5)
        probs = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs,
                         v.astype(jnp.float32))
        ctx = ctx.reshape(b, s, h).astype(cfg.dtype)
        return dense("out_proj")(ctx)


class ViTLayer(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            param_dtype=cfg.param_dtype, name=name)
        x = x + ViTAttention(cfg, name="attention")(
            ln("layer_norm1")(x).astype(cfg.dtype))
        mlp_in = ln("layer_norm2")(x).astype(cfg.dtype)
        y = nn.Dense(cfg.intermediate_size, use_bias=True,
                     dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="fc1")(mlp_in)
        y = quick_gelu(y.astype(jnp.float32)).astype(cfg.dtype)
        y = nn.Dense(cfg.hidden_size, use_bias=True, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="fc2")(y)
        return x + y


class ViTModel(nn.Module):
    """pixel_values [B, 3, H, W] (HF channel-first layout, f32 already
    CLIP-normalized) → patch+CLS features.

    `output_layer=None` runs all layers + the post layernorm (the CLIP
    embedding head's input). LLaVA reads the PENULTIMATE layer without
    post-LN: `output_layer = num_layers - 1`.
    """

    config: ViTConfig

    @nn.compact
    def __call__(self, pixel_values, output_layer: int | None = None):
        cfg = self.config
        b = pixel_values.shape[0]
        p, g = cfg.patch_size, cfg.grid
        # stride-P conv == per-patch flatten + one matmul on the MXU
        x = pixel_values.reshape(b, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            b, g * g, 3 * p * p).astype(cfg.dtype)
        kernel = self.param(
            "patch_kernel", nn.initializers.normal(0.02),
            (3 * p * p, cfg.hidden_size), cfg.param_dtype)
        x = x @ kernel.astype(cfg.dtype)
        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02),
                         (cfg.hidden_size,), cfg.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype),
                              (b, 1, cfg.hidden_size)), x], axis=1)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (cfg.num_patches + 1, cfg.hidden_size),
                         cfg.param_dtype)
        x = x + pos[None].astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=cfg.param_dtype,
                         name="pre_layernorm")(x).astype(cfg.dtype)
        n = cfg.num_layers if output_layer is None else output_layer
        for i in range(n):
            x = ViTLayer(cfg, name=f"layer_{i}")(x)
        if output_layer is None:
            x = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                param_dtype=cfg.param_dtype,
                name="post_layernorm")(x).astype(cfg.dtype)
        return x


# CLIP preprocessing constants (OPENAI_CLIP_MEAN/STD)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_image_raw(image, image_size: int):
    """PIL.Image (or [H, W, 3] uint8 array) → [S, S, 3] uint8, bicubic
    resize only — NO normalization. The companion of
    `LlavaGenerator.encode_image` on uint8 input, which normalizes ON
    DEVICE: the axon tunnel upload dominates the ViT forward
    (measured 2026-08-20: b=8 host-input 310 ms vs device-input
    41.7 ms), and uint8 HWC is 4x smaller than normalized f32."""
    import numpy as np

    try:
        from PIL import Image
    except Exception:  # pragma: no cover - PIL is in the image
        Image = None
    if Image is not None and isinstance(image, np.ndarray) \
            and image.dtype == np.uint8 \
            and image.shape[:2] != (image_size, image_size):
        image = Image.fromarray(image)
    if Image is not None and not isinstance(image, np.ndarray):
        img = image.convert("RGB").resize(
            (image_size, image_size), Image.BICUBIC)
        return np.asarray(img, np.uint8)
    arr = np.asarray(image)
    if arr.shape[:2] != (image_size, image_size):
        ys = (np.arange(image_size) * arr.shape[0]
              // image_size).astype(int)
        xs = (np.arange(image_size) * arr.shape[1]
              // image_size).astype(int)
        arr = arr[ys][:, xs]
    if arr.dtype != np.uint8:
        arr = np.clip(np.asarray(arr, np.float32)
                      * (255.0 if arr.max() <= 1.5 else 1.0),
                      0, 255).astype(np.uint8)
    return arr


def normalize_uint8_pixels(pixels):
    """[B, S, S, 3] uint8 → [B, 3, S, S] f32 CLIP-normalized, in jnp —
    traced INSIDE the encode program so raw bytes ride the tunnel and
    the scale/shift/transpose fuse into the first ViT conv."""
    import jax.numpy as jnp

    x = pixels.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    x = (x - mean) / std
    return jnp.transpose(x, (0, 3, 1, 2))


def preprocess_image(image, image_size: int):
    """PIL.Image (or [H, W, 3] uint8 array) → [3, S, S] f32,
    CLIP-normalized, bicubic resize — matches HF CLIPImageProcessor
    with do_center_crop on a square resize (shortest-edge then crop
    degenerates to plain resize for our square target)."""
    import numpy as np

    try:
        from PIL import Image
    except Exception:  # pragma: no cover - PIL is in the image
        Image = None
    if Image is not None and isinstance(image, np.ndarray) \
            and image.dtype == np.uint8 \
            and image.shape[:2] != (image_size, image_size):
        # arrays resize through PIL too — bicubic, matching HF
        image = Image.fromarray(image)
    if Image is not None and not isinstance(image, np.ndarray):
        img = image.convert("RGB").resize(
            (image_size, image_size), Image.BICUBIC)
        arr = np.asarray(img, np.float32) / 255.0
    else:
        arr = np.asarray(image, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        if arr.shape[:2] != (image_size, image_size):
            # nearest-neighbor floor: PIL absent or non-uint8 input
            ys = (np.arange(image_size) * arr.shape[0]
                  // image_size).astype(int)
            xs = (np.arange(image_size) * arr.shape[1]
                  // image_size).astype(int)
            arr = arr[ys][:, xs]
    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    arr = (arr - mean) / std
    return arr.transpose(2, 0, 1)
