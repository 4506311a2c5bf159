"""LLaVA-class multimodal composition: ViT tower → MLP projector →
the resident decoder. TPU-native replacement for the reference's
Ollama LLaVA endpoint.

Reference parity: every vision call the reference makes —
SCHEMA_DPO / INFOGRAPHIE / PHOTO_DECO image classification
(`/root/reference/src/processing/classify_images.py:45-70`) and the
infographic-PDF description fallback (`process_and_chunk.py`, vision
path) — is a prompt + one image → text completion. Here that runs
entirely on-chip: CLIP-ViT patches (penultimate layer, CLS dropped)
project through the 2-layer GELU MLP into the decoder's embedding
space, splice between the prompt-token embeddings, and decode with the
SAME cached decode programs the text path uses.

Weights load from HF `LlavaForConditionalGeneration` exports via
`convert_llava_state_dict` (models/convert.py); logits parity vs the
HF model is pinned by tests/test_llava.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .decoder import DecoderConfig
from .generate import SamplingConfig, TextGenerator
from .vit import ViTConfig, ViTModel, preprocess_image, \
    preprocess_image_raw


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    vision: ViTConfig
    text: DecoderConfig
    # -2 = penultimate ViT layer, no post-LN (LLaVA-1.5's choice)
    vision_feature_layer: int = -2
    drop_cls: bool = True

    @classmethod
    def tiny(cls, **kw) -> "LlavaConfig":
        return cls(vision=ViTConfig.tiny(),
                   text=DecoderConfig.tiny(), **kw)

    @property
    def num_image_tokens(self) -> int:
        n = self.vision.num_patches
        return n if self.drop_cls else n + 1


class LlavaProjector(nn.Module):
    """HF `multi_modal_projector`: linear → GELU (exact) → linear."""

    text_hidden: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.text_hidden, use_bias=True, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_1")(x)
        x = nn.gelu(x.astype(jnp.float32),
                    approximate=False).astype(self.dtype)
        return nn.Dense(self.text_hidden, use_bias=True,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="linear_2")(x)


class LlavaGenerator:
    """Drives image+text generation against a shared `TextGenerator`
    (the decoder may be the serving pool's own instance — vision
    traffic reuses its weights and decode programs)."""

    def __init__(self, config: LlavaConfig,
                 generator: TextGenerator | None = None,
                 params: dict | None = None,
                 image_cache: int = 4):
        self.config = config
        self.vision = ViTModel(config.vision)
        self.projector = LlavaProjector(
            config.text.hidden_size, dtype=config.text.dtype,
            param_dtype=config.text.param_dtype)
        self.generator = generator or TextGenerator(config.text)
        # {"vision": ..., "projector": ...}; decoder params live in the
        # TextGenerator (convert_llava_state_dict returns all three)
        self._params = params
        self._programs: dict = {}
        # digest-keyed LRU of DEVICE-RESIDENT projected patches: the
        # ingest pipeline classifies images BEFORE dedup (reference
        # phase order 4B → 4C), so duplicate images would pay the ViT
        # tower once per copy; multi-turn chat about one image repeats
        # it too. [n_img, H] bf16 ≈ 5.9 MB at 12B/CLIP-L — the default
        # 4 entries cost ~24 MB HBM. 0 disables.
        import threading
        from collections import OrderedDict

        self.image_cache = int(image_cache)
        self._patch_cache: OrderedDict = OrderedDict()
        self._patch_lock = threading.Lock()
        self.cache_stats = {"hits": 0, "misses": 0}

    def load(self):
        if self._params is None:
            rng = jax.random.key(0)
            cfg = self.config
            pix = jnp.zeros((1, 3, cfg.vision.image_size,
                             cfg.vision.image_size), jnp.float32)
            feats = jnp.zeros(
                (1, cfg.num_image_tokens, cfg.vision.hidden_size),
                jnp.float32)
            self._params = {
                "vision": self.vision.init(rng, pix)["params"],
                "projector": self.projector.init(rng, feats)["params"],
            }
        return self._params

    def load_converted(self, tree: dict):
        """Output of `convert_llava_state_dict`: installs vision +
        projector here and the decoder tree into the TextGenerator."""
        self._params = {
            "vision": jax.tree.map(jnp.asarray, tree["vision"]),
            "projector": jax.tree.map(jnp.asarray, tree["projector"]),
        }
        self.generator.load_converted_tree(tree["decoder"])
        return self._params

    def _encode_program(self, b: int, u8: bool = False):
        key = ("encode_image_u8" if u8 else "encode_image", b)
        if key not in self._programs:
            cfg = self.config
            n_layers = cfg.vision.num_layers
            out_layer = n_layers + 1 + cfg.vision_feature_layer \
                if cfg.vision_feature_layer < 0 \
                else cfg.vision_feature_layer

            @jax.jit
            def encode(params, pixels):
                if u8:
                    from .vit import normalize_uint8_pixels

                    pixels = normalize_uint8_pixels(pixels)
                feats = self.vision.apply(
                    {"params": params["vision"]}, pixels,
                    output_layer=out_layer)
                if cfg.drop_cls:
                    feats = feats[:, 1:]
                return self.projector.apply(
                    {"params": params["projector"]}, feats)

            self._programs[key] = encode
        return self._programs[key]

    def encode_image(self, pixel_values: np.ndarray,
                     fetch: bool = True):
        """[B, 3, S, S] CLIP-normalized f32 pixels — or [B, S, S, 3]
        RAW uint8 (from `vit.preprocess_image_raw`) — → [B,
        n_image_tokens, text_hidden] projected patch embeddings.

        uint8 input normalizes ON DEVICE (`normalize_uint8_pixels`
        traced into the encode program): raw bytes are 4x smaller than
        normalized f32 and the tunnel UPLOAD dominates the ViT forward
        (measured 2026-08-20: b=8 host f32 310 ms vs 41.7 ms once
        resident — see BENCHMARKS.md vision table).

        `fetch=False` returns the DEVICE array (a handle) instead of
        copying to host — the output is [B, 576, text_hidden] f32
        (~12 MB/image at 12B scale) and through the axon tunnel that
        copy dominates the ViT forward itself (benchmarks/
        bench_vision.py: batching made images/s WORSE fetch-bound).
        Every in-framework consumer composes on device
        (`encode_patches` → `_splice_program`) and never pays it;
        pass fetch=False to keep that property when batch-encoding."""
        params = self.load()
        b = pixel_values.shape[0]
        u8 = (getattr(pixel_values, "dtype", None) == np.uint8)
        pix = (jnp.asarray(pixel_values) if u8
               else jnp.asarray(pixel_values, jnp.float32))
        out = self._encode_program(b, u8=u8)(params, pix)
        return np.asarray(out) if fetch else out

    def encode_patches(self, img_arr):
        """[3, S, S] CLIP-normalized pixels → [n_img, text_hidden]
        projected patches, DEVICE-RESIDENT, through the digest-keyed
        LRU: a repeated image (ingest duplicates pre-dedup, multi-turn
        chat about one picture) skips the whole ViT+projector forward.
        The digest keys the post-preprocess pixel bytes, so every
        input form (PIL / uint8 HWC / pre-normalized CHW) that renders
        the same pixels hits the same entry.

        [S, S, 3] RAW uint8 input (from `preprocess_image_raw`) skips
        host normalization: the bytes upload 4x smaller and normalize
        on device inside the encode program — the tunnel upload, not
        the ViT forward, is the measured bound (BENCHMARKS.md vision
        table, 2026-08-20)."""
        arr = np.asarray(img_arr)
        u8 = arr.dtype == np.uint8 and arr.ndim == 3 \
            and arr.shape[-1] == 3
        arr = np.ascontiguousarray(
            arr if u8 else np.asarray(arr, np.float32))
        digest = None
        if self.image_cache > 0:
            import hashlib

            digest = hashlib.sha1(arr.tobytes()).hexdigest()
            with self._patch_lock:
                hit = self._patch_cache.get(digest)
                if hit is not None:
                    self._patch_cache.move_to_end(digest)
                    self.cache_stats["hits"] += 1
                    return hit
        patches = self._encode_program(1, u8=u8)(
            self.load(), jnp.asarray(arr[None]))[0]
        if digest is not None:
            with self._patch_lock:
                self.cache_stats["misses"] += 1
                self._patch_cache[digest] = patches
                while len(self._patch_cache) > self.image_cache:
                    self._patch_cache.popitem(last=False)
        return patches

    def _splice_program(self, p: int, q: int, s: int):
        """Device program building the multimodal prefix from already
        projected patches: token embeds + splice + pad — no host
        round-trip (patches arrive as a device array from
        `encode_patches`; the splice is dispatch-cheap next to the ViT
        forward, and splitting the two is what makes the patch LRU
        possible)."""
        key = ("splice", p, q, s)
        if key not in self._programs:
            cfg = self.config
            n_img = cfg.num_image_tokens

            @jax.jit
            def compose(dec_params, img, pre_ids, pre_len,
                        post_ids, post_len):
                table = dec_params["params"]["embed_tokens"][
                    "embedding"]
                pre_e = jnp.take(table, pre_ids, axis=0)
                post_e = jnp.take(table, post_ids, axis=0)
                pos = jnp.arange(s)
                total = pre_len + n_img + post_len
                in_pre = pos < pre_len
                in_img = (pos >= pre_len) & (pos < pre_len + n_img)
                idx_pre = jnp.clip(pos, 0, p - 1)
                idx_img = jnp.clip(pos - pre_len, 0, n_img - 1)
                idx_post = jnp.clip(pos - pre_len - n_img, 0, q - 1)
                dt = cfg.text.dtype
                e = jnp.where(
                    in_pre[:, None], pre_e[idx_pre].astype(dt),
                    jnp.where(in_img[:, None],
                              img[idx_img].astype(dt),
                              post_e[idx_post].astype(dt)))
                e = jnp.where((pos < total)[:, None], e,
                              jnp.zeros((), dt))
                return e[None], total

            self._programs[key] = compose
        return self._programs[key]

    def compose(self, pre_ids: np.ndarray, post_ids: np.ndarray,
                image):
        """Build the device-resident multimodal prefix: one image
        spliced between two token spans (the usual "<s>USER: <image>
        \\nprompt ASSISTANT:" template split at the image position).
        → (embeds [1, S, H] ON DEVICE, true length). Shared by the
        direct decode path (`generate`) and the continuous pool
        (`ContinuousDriver.submit_embeds`).

        `image`: PIL image / [H, W, 3] uint8 array / pre-processed
        [3, S, S] f32 CLIP-normalized array. PIL and raw-uint8 inputs
        resize on host (`preprocess_image_raw`) but normalize ON
        DEVICE — raw bytes ride the tunnel 4x smaller than f32 (the
        measured upload bound, BENCHMARKS.md vision table).
        """
        cfg = self.config
        img = np.asarray(image) if not hasattr(image, "convert") \
            else image
        if getattr(img, "ndim", 0) == 3 and hasattr(img, "shape") \
                and img.shape[0] == 3 and img.dtype != np.uint8:
            pass  # pre-normalized [3, S, S] f32: upload as-is
        else:
            img = preprocess_image_raw(image, cfg.vision.image_size)

        from ..tokenize.base import bucket_length

        pre_ids = np.asarray(pre_ids, np.int32).reshape(-1)
        post_ids = np.asarray(post_ids, np.int32).reshape(-1)
        pad = getattr(cfg.text, "pad_id", 1)
        # bucket_length CLAMPS to its last bucket — an overflowing span
        # must fail loudly here, not as a broadcast error downstream
        p = bucket_length(max(len(pre_ids), 1), buckets=(8, 32, 128))
        q = bucket_length(max(len(post_ids), 1))
        if len(pre_ids) > p or len(post_ids) > q:
            raise ValueError(
                f"vision prompt spans too long (pre {len(pre_ids)}, "
                f"post {len(post_ids)}; buckets {p}/{q})")
        n = len(pre_ids) + cfg.num_image_tokens + len(post_ids)
        s = bucket_length(n)
        pre_p = np.full((p,), pad, np.int32)
        pre_p[: len(pre_ids)] = pre_ids
        post_p = np.full((q,), pad, np.int32)
        post_p[: len(post_ids)] = post_ids
        patches = self.encode_patches(img)
        embeds, _total = self._splice_program(p, q, s)(
            self.generator.load(), patches,
            jnp.asarray(pre_p), jnp.asarray(len(pre_ids), jnp.int32),
            jnp.asarray(post_p),
            jnp.asarray(len(post_ids), jnp.int32))
        return embeds, n

    def generate(self, pre_ids: np.ndarray, post_ids: np.ndarray,
                 image, sampling: SamplingConfig | None = None,
                 rng_seed: int = 0) -> np.ndarray:
        """compose() + direct decode → generated ids [1, max_new].
        `rng_seed` is the ROW seed (raw, like the serving layer's
        per-request seeds — the continuous pool uses the same value
        directly, which is what makes pool and direct decode
        bit-identical for the same seed)."""
        embeds, n = self.compose(pre_ids, post_ids, image)
        # embeds stays ON DEVICE; generate_with_embeds' jnp.asarray is
        # a no-copy passthrough
        return self.generator.generate_with_embeds(
            embeds, np.asarray([n], np.int32), sampling,
            rng_seeds=np.asarray([rng_seed], np.uint32))
