"""LLaVA multimodal stack: HF logits parity + generate smoke.

The TPU-native replacement for the reference's Ollama LLaVA endpoint
(`/root/reference/src/processing/classify_images.py:45-70`): ViT
patches → MLP projector → decoder with spliced inputs_embeds must
match HF `LlavaForConditionalGeneration` exactly so real checkpoints
load losslessly.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.models.convert import convert_llava_state_dict
from rag_dpo_tpu.models.decoder import DecoderConfig, DecoderModel
from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator
from rag_dpo_tpu.models.llava import LlavaConfig, LlavaGenerator
from rag_dpo_tpu.models.vit import ViTConfig

IMG_TOKEN = 255


def _hf_tiny_llava():
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
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        rms_norm_eps=1e-5, rope_theta=10000.0, attention_bias=False,
        tie_word_embeddings=False)
    cfg = HFLlavaConfig(
        vision_config=vis, text_config=txt,
        image_token_index=IMG_TOKEN, projector_hidden_act="gelu",
        vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(cfg).eval()
    return torch, hf


def _ours():
    return LlavaConfig(
        vision=ViTConfig.tiny(dtype=jnp.float32),
        text=DecoderConfig(
            vocab_size=256, hidden_size=32, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=64, rope_theta=10000.0,
            max_seq_len=128, dtype=jnp.float32,
            param_dtype=jnp.float32))


def test_torch_parity_llava_logits():
    """Full multimodal forward (tokens + spliced image patches) ==
    HF LlavaForConditionalGeneration, every position."""
    torch, hf = _hf_tiny_llava()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = _ours()
    gen = TextGenerator(cfg.text)
    lg = LlavaGenerator(cfg, generator=gen)
    lg.load_converted(convert_llava_state_dict(state))

    rng = np.random.default_rng(5)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    n_img = cfg.num_image_tokens  # 16 patches
    pre = rng.integers(3, 200, (3,)).astype(np.int64)
    post = rng.integers(3, 200, (5,)).astype(np.int64)
    ids = np.concatenate(
        [pre, np.full((n_img,), IMG_TOKEN, np.int64), post])[None]

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(pixels)).logits.numpy()

    img_embeds = lg.encode_image(pixels)            # [1, 16, 32]
    pre_e = gen.embed_ids(pre[None])[0]
    post_e = gen.embed_ids(post[None])[0]
    embeds = np.concatenate(
        [pre_e, np.asarray(img_embeds[0], pre_e.dtype), post_e],
        axis=0)[None]
    ours = DecoderModel(cfg.text).apply(
        gen.load(), jnp.zeros(embeds.shape[:2], jnp.int32),
        inputs_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-3,
                               rtol=3e-3)


def test_llava_generate_greedy_deterministic_and_image_sensitive():
    cfg = _ours()
    lg = LlavaGenerator(cfg)
    rng = np.random.default_rng(6)
    img_a = rng.integers(0, 255, (28, 28, 3)).astype(np.uint8)
    img_b = rng.integers(0, 255, (28, 28, 3)).astype(np.uint8)
    pre = np.asarray([5, 6, 7], np.int32)
    post = np.asarray([8, 9], np.int32)
    sampling = SamplingConfig(temperature=0.0, max_new_tokens=6,
                              eos_id=-1, pad_id=0)

    t1 = lg.generate(pre, post, img_a, sampling)
    t2 = lg.generate(pre, post, img_a, sampling)
    assert np.array_equal(t1, t2)  # greedy is deterministic
    assert t1.shape == (1, 6)

    # different image → different first-step logits (random init makes
    # identical logits vanishingly unlikely); assert via the embeds
    ea = lg.encode_image(
        np.asarray([lg_preprocess(img_a)], np.float32))
    eb = lg.encode_image(
        np.asarray([lg_preprocess(img_b)], np.float32))
    assert np.abs(ea - eb).max() > 1e-4


def lg_preprocess(img):
    from rag_dpo_tpu.models.vit import preprocess_image

    return preprocess_image(img, 28)


def test_embeds_prefill_matches_ids_prefill():
    """Text-only inputs through the embeds path must decode exactly
    like the ids path (the multimodal prefill is a strict superset)."""
    cfg = DecoderConfig.tiny()
    gen = TextGenerator(cfg)
    rng = np.random.default_rng(7)
    ids = rng.integers(3, 500, (2, 12)).astype(np.int32)
    padded = np.full((2, 32), 1, np.int32)
    padded[:, :12] = ids
    lengths = np.asarray([12, 12], np.int32)
    sampling = SamplingConfig(temperature=0.0, max_new_tokens=8,
                              eos_id=-1, pad_id=0)

    via_ids = gen.generate_ids(padded, lengths, sampling)
    embeds = gen.embed_ids(padded)
    via_embeds = gen.generate_with_embeds(
        embeds.astype(np.float32), lengths, sampling)
    assert np.array_equal(via_ids, via_embeds)


def test_provider_generate_with_image():
    """TPULLMProvider vision: in-band 'not supported' before
    attach_vision, real on-chip generation after — the same
    `generate_with_image` contract the ingest image classifier and the
    infographic-PDF fallback call (they previously REQUIRED an external
    Ollama LLaVA endpoint)."""
    import io

    from PIL import Image

    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    llm = TPULLMProvider(DecoderConfig.tiny(), max_new_tokens=8)
    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 40, 3))
        .astype(np.uint8)).save(buf, format="PNG")
    png = buf.getvalue()

    resp = llm.generate_with_image("Décris cette image.", png)
    assert not resp.ok and "vision" in resp.error

    llm.attach_vision(ViTConfig.tiny())
    resp = llm.generate_with_image("Décris cette image.", png)
    assert resp.ok, resp.error
    assert isinstance(resp.text, str)
    # greedy determinism through the provider
    resp2 = llm.generate_with_image("Décris cette image.", png)
    assert resp2.text == resp.text

    # corrupt image bytes degrade in-band, never raise
    bad = llm.generate_with_image("Décris.", b"not an image")
    assert not bad.ok


def test_image_classifier_runs_on_tpu_vision():
    """The ingest image classifier (reference classify_images.py)
    drives the TPU vision provider end-to-end: OCR-gated images flow
    to generate_with_image and the decision ladder stays in-band even
    with random-init weights."""
    import io

    from PIL import Image

    from rag_dpo_tpu.ingest.images import ImageClassifier
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    llm = TPULLMProvider(DecoderConfig.tiny(), max_new_tokens=8)
    llm.attach_vision(ViTConfig.tiny())
    clf = ImageClassifier(vision_llm=llm)
    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (60, 80, 3))
        .astype(np.uint8)).save(buf, format="PNG")
    decision = clf.classify(buf.getvalue())
    assert decision.label  # some label, via vision or default ladder
    assert decision.method in ("ocr_gate", "vision", "default")


def test_device_compose_matches_host_compose():
    """generate() now builds the multimodal prefix in ONE device
    program (encode + embed + splice + pad, no host round-trip); it
    must decode bit-identically to the hand-composed host path."""
    cfg = _ours()
    lg = LlavaGenerator(cfg)
    gen = lg.generator
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (28, 28, 3)).astype(np.uint8)
    pre = np.asarray([5, 6, 7], np.int32)
    post = np.asarray([8, 9, 10, 11], np.int32)
    sampling = SamplingConfig(temperature=0.0, max_new_tokens=7,
                              eos_id=-1, pad_id=0)

    via_compose = lg.generate(pre, post, img, sampling)

    from rag_dpo_tpu.models.vit import preprocess_image
    from rag_dpo_tpu.tokenize.base import bucket_length

    pixels = preprocess_image(img, 28)[None].astype(np.float32)
    img_e = lg.encode_image(pixels)[0]
    pre_e = gen.embed_ids(pre[None])[0]
    post_e = gen.embed_ids(post[None])[0]
    embeds = np.concatenate(
        [np.asarray(pre_e, np.float32),
         np.asarray(img_e, np.float32),
         np.asarray(post_e, np.float32)], axis=0)
    n = embeds.shape[0]
    s = bucket_length(n)
    padded = np.zeros((1, s, embeds.shape[1]), np.float32)
    padded[0, :n] = embeds
    via_host = gen.generate_with_embeds(
        padded, np.asarray([n], np.int32), sampling)
    assert np.array_equal(via_compose, via_host)


def test_provider_vision_span_specials_and_seed():
    """The two independently-encoded prompt spans must not leak
    special tokens into the middle of the composed prefix (no SEP at
    pre's end, no CLS at post's start — a real checkpoint would see an
    off-distribution prompt); `seed` pins sampled vision generations."""
    import io

    from PIL import Image

    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    llm = TPULLMProvider(DecoderConfig.tiny(), max_new_tokens=6)
    lg = llm.attach_vision(ViTConfig.tiny())
    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(2).integers(0, 255, (36, 36, 3))
        .astype(np.uint8)).save(buf, format="PNG")
    png = buf.getvalue()

    captured = {}
    orig = lg.generate

    def spy(pre_ids, post_ids, image, sampling=None, rng_seed=0):
        captured["pre"] = np.asarray(pre_ids)
        captured["post"] = np.asarray(post_ids)
        captured["rng_seed"] = rng_seed
        return orig(pre_ids, post_ids, image, sampling,
                    rng_seed=rng_seed)

    lg.generate = spy
    tok = llm.tokenizer
    r = llm.generate_with_image("Que montre ce schéma ?", png)
    assert r.ok, r.error
    pre, post = captured["pre"], captured["post"]
    assert len(pre) and pre[0] == tok.cls_id      # leading BOS kept
    assert pre[-1] != tok.sep_id                  # no SEP before image
    assert post[0] != tok.cls_id                  # no CLS after image
    assert post[-1] != tok.sep_id                 # prompt not EOS-ended

    # seed pins the sampled stream
    a = llm.generate_with_image("Décris.", png, temperature=0.8,
                                seed=7)
    b = llm.generate_with_image("Décris.", png, temperature=0.8,
                                seed=7)
    c = llm.generate_with_image("Décris.", png, temperature=0.8,
                                seed=8)
    assert a.ok and b.ok and c.ok
    assert a.text == b.text
    assert captured["rng_seed"] is not None
    del c  # different seed may or may not differ at tiny scale


def test_vision_through_continuous_pool_matches_direct():
    """Multimodal continuous batching: a vision request joins the slot
    pool (embeds prefill, co-resident decode with text neighbors) and
    must produce EXACTLY the direct-path answer — greedy and seeded
    sampling — while concurrent text requests keep their own solo
    parity."""
    import io
    import threading

    from PIL import Image

    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    cfg = DecoderConfig.tiny()
    pool = TPULLMProvider(cfg, max_new_tokens=8, continuous=True,
                          max_batch=3, speculative=True,
                          prefix_cache=2, prefill_chunk=16)
    params = pool.generator.load()
    lv_pool = pool.attach_vision(ViTConfig.tiny())
    vparams = lv_pool.load()

    direct = TPULLMProvider(cfg, params=params, max_new_tokens=8)
    lv_direct = direct.attach_vision(ViTConfig.tiny())
    lv_direct._params = vparams          # share the vision tower

    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(3).integers(0, 255, (40, 40, 3))
        .astype(np.uint8)).save(buf, format="PNG")
    png = buf.getvalue()
    q = "Décris cette image en une phrase."

    ref = direct.generate_with_image(q, png)
    assert ref.ok, ref.error
    got = pool.generate_with_image(q, png)
    assert got.ok, got.error
    assert got.text == ref.text          # pool == direct, greedy

    # seeded sampling parity across schedulers
    refs = direct.generate_with_image(q, png, temperature=0.8, seed=5)
    gots = pool.generate_with_image(q, png, temperature=0.8, seed=5)
    assert refs.ok and gots.ok
    assert gots.text == refs.text

    # co-resident with text traffic: 2 text + 1 vision concurrently,
    # each equal to its solo run
    t_solo = direct.generate("Quelles sanctions la CNIL prononce ?",
                             max_tokens=8)
    out: dict = {}

    def tgen():
        out["t"] = pool.generate(
            "Quelles sanctions la CNIL prononce ?", max_tokens=8)

    def vgen():
        out["v"] = pool.generate_with_image(q, png)

    th = [threading.Thread(target=tgen), threading.Thread(target=vgen),
          threading.Thread(target=tgen)]
    [x.start() for x in th]
    [x.join() for x in th]
    assert out["t"].ok and out["v"].ok
    assert out["t"].text == t_solo.text
    assert out["v"].text == ref.text
    # vision requests never enter the prefix cache and are unpreemptable
    eng = pool._driver.engine
    assert eng.stats["admitted"] >= 4
    pool._driver.close()


def test_vision_streaming_pool_and_direct():
    """True streaming vision: pool deltas concatenate to exactly the
    one-shot answer (greedy + seeded), early close cancels the decode,
    penalties ride the pool; the direct scheduler yields one delta and
    rejects penalties eagerly instead of dropping them."""
    import io

    from PIL import Image

    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    cfg = DecoderConfig.tiny()
    pool = TPULLMProvider(cfg, max_new_tokens=8, continuous=True,
                          max_batch=2, speculative=True)
    params = pool.generator.load()
    lv_pool = pool.attach_vision(ViTConfig.tiny())
    vparams = lv_pool.load()
    direct = TPULLMProvider(cfg, params=params, max_new_tokens=8)
    lv_direct = direct.attach_vision(ViTConfig.tiny())
    lv_direct._params = vparams

    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(9).integers(0, 255, (40, 40, 3))
        .astype(np.uint8)).save(buf, format="PNG")
    png = buf.getvalue()
    q = "Décris cette image."

    ref = pool.generate_with_image(q, png)
    assert ref.ok, ref.error
    deltas = list(pool.generate_with_image_stream(q, png))
    assert len(deltas) >= 2           # real per-token deltas
    assert "".join(deltas) == ref.text

    # seeded sampling stream == seeded one-shot
    refs = pool.generate_with_image(q, png, temperature=0.8, seed=7)
    assert refs.ok
    assert "".join(pool.generate_with_image_stream(
        q, png, temperature=0.8, seed=7)) == refs.text

    # penalties ride the pool (completion-token counts; just must run
    # and stay a valid stream)
    pen = "".join(pool.generate_with_image_stream(
        q, png, frequency_penalty=0.5))
    assert isinstance(pen, str)

    # early close cancels: slot frees instead of decoding to max_new.
    # Deterministic setup: a NON-speculative pool (each dispatch emits
    # exactly `chunk` tokens — drafts could otherwise finish the whole
    # budget in one dispatch under load) with a 24-token budget and a
    # throttled step, so after the first delta ≥5 more dispatches
    # remain and the queued cancel always lands mid-decode.
    cpool = TPULLMProvider(cfg, params=params, max_new_tokens=24,
                           continuous=True, max_batch=2)
    lv_c = cpool.attach_vision(ViTConfig.tiny())
    lv_c._params = vparams
    cpool.generate_with_image(q, png)          # warm all programs
    eng = cpool._driver.engine
    orig_step = eng.step
    eng.step = lambda: (time.sleep(0.3), orig_step())[1]
    try:
        before = eng.stats["cancelled"]
        s = cpool.generate_with_image_stream(q, png, max_tokens=24)
        next(s)
        s.close()
        deadline = time.time() + 10
        while (eng.stats["cancelled"] == before
               and time.time() < deadline):
            time.sleep(0.01)
        assert eng.stats["cancelled"] == before + 1
    finally:
        eng.step = orig_step
        cpool._driver.close()

    # direct scheduler: single delta, equal to the one-shot text
    dref = direct.generate_with_image(q, png)
    ddeltas = list(direct.generate_with_image_stream(q, png))
    assert "".join(ddeltas) == dref.text
    assert len(ddeltas) <= 1

    # penalties without a pool: eager error, never a silent drop
    with pytest.raises(ValueError, match="continuous"):
        direct.generate_with_image_stream(q, png, presence_penalty=0.5)
    r = direct.generate_with_image(q, png, presence_penalty=0.5)
    assert not r.ok and "continuous" in r.error
    pool._driver.close()


def test_image_patch_cache_hits_and_parity():
    """Digest-keyed patch LRU: a repeated image skips the ViT forward
    (hit counted) and composes a bit-identical prefix; different
    images miss; every input form of the same pixels shares one entry;
    LRU evicts beyond capacity; image_cache=0 disables."""
    cfg = LlavaConfig.tiny()
    lg = LlavaGenerator(cfg, image_cache=2)
    lg.load()
    rng = np.random.default_rng(5)
    img_a = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
    img_b = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
    pre = np.asarray([3, 4], np.int32)
    post = np.asarray([5, 6, 7], np.int32)

    e1, n1 = lg.compose(pre, post, img_a)
    assert lg.cache_stats == {"hits": 0, "misses": 1}
    e2, n2 = lg.compose(pre, post, img_a)
    assert lg.cache_stats == {"hits": 1, "misses": 1}
    assert n1 == n2
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    # same pixels through PIL hit the same entry
    from PIL import Image as _Image

    lg.compose(pre, post, _Image.fromarray(img_a))
    assert lg.cache_stats["hits"] == 2

    lg.compose(pre, post, img_b)
    assert lg.cache_stats == {"hits": 2, "misses": 2}
    assert len(lg._patch_cache) == 2

    # third distinct image evicts the LRU entry (img_a is most
    # recently used after the PIL hit? no — img_b is; touch img_a
    # then add c: b evicted)
    lg.compose(pre, post, img_a)
    img_c = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
    lg.compose(pre, post, img_c)
    assert len(lg._patch_cache) == 2
    lg.compose(pre, post, img_b)          # must MISS (evicted)
    assert lg.cache_stats["misses"] == 4

    off = LlavaGenerator(cfg, image_cache=0)
    off._params = lg._params
    off.generator = lg.generator
    eo, _ = off.compose(pre, post, img_a)
    off.compose(pre, post, img_a)
    assert off.cache_stats == {"hits": 0, "misses": 0}
    np.testing.assert_array_equal(np.asarray(eo), np.asarray(e1))


def test_encode_image_uint8_matches_host_normalized_f32():
    """Raw uint8 HWC input (device-side normalize — the 4x-smaller
    tunnel upload, BENCHMARKS.md vision table) must produce the same
    patches as the host-normalized f32 CHW path, and encode_patches
    must serve it through the LRU."""
    from rag_dpo_tpu.models.vit import preprocess_image, \
        preprocess_image_raw

    cfg = LlavaConfig.tiny()
    lg = LlavaGenerator(cfg)
    lg.load()
    s = cfg.vision.image_size
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (s, s, 3), dtype=np.uint8)
    f32 = preprocess_image(raw, s)
    u8 = preprocess_image_raw(raw, s)
    assert u8.dtype == np.uint8 and u8.shape == (s, s, 3)
    a = lg.encode_image(np.asarray([f32], np.float32))
    b = lg.encode_image(u8[None])
    np.testing.assert_allclose(a, b, atol=2e-4)
    p1 = np.asarray(lg.encode_patches(u8))
    np.asarray(lg.encode_patches(u8))
    np.testing.assert_allclose(p1, a[0], atol=2e-4)
    assert lg.cache_stats["hits"] == 1
