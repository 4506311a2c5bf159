"""On-chip vision: ViT-L/14-336 encode throughput + image→text e2e.

The reference's vision traffic (image classification, infographic
description — classify_images.py:45-70) goes to an Ollama LLaVA
endpoint on CPU/GPU elsewhere; here the whole path runs on the one
TPU chip next to the serving stack.

Arms:
  encode_b{1,8}  — CLIP-ViT-L/14-336 (304 M params, 577 tokens) patch
                   encode + projector, images/s. NOTE: includes the
                   [B, 576, 5120] f32 output fetch (~12 MB/image) —
                   through the axon tunnel that fetch DOMINATES; the
                   serving path never pays it (generate() composes the
                   whole prefix on device: `encode_patches` +
                   `_splice_program`)
  e2e_12b        — generate_with_image through TPULLMProvider: PIL
                   decode → CLIP preprocess → on-device
                   encode+embed+splice → 12B int8 decode of 64 tokens
                   (576 image tokens in the prefix); DISTINCT image
                   per rep so the patch LRU never hits (cold path)
  e2e_repeat     — same, ONE image repeated: the digest-keyed patch
                   cache (models/llava.py) skips the ViT forward —
                   the ingest-duplicate / multi-turn-chat case

Run on the real chip:  python benchmarks/bench_vision.py
Tiny CPU smoke:        BENCH_TINY=1 python benchmarks/bench_vision.py
"""

import io
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("BENCH_TINY"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np

TINY = bool(os.environ.get("BENCH_TINY"))


def main():
    import dataclasses

    import jax.numpy as jnp

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.models.vit import ViTConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    if TINY:
        dec_cfg = DecoderConfig.tiny()
        vit_cfg = ViTConfig.tiny()
        reps, max_new = 2, 8
    else:
        dec_cfg = dataclasses.replace(
            DecoderConfig.mistral_nemo_12b(), quantize_weights=True,
            tie_embeddings=True, max_seq_len=2048,
            param_dtype=jnp.bfloat16)
        vit_cfg = ViTConfig.clip_vit_l_336()
        reps, max_new = 4, 64

    t0 = time.time()
    llm = TPULLMProvider(dec_cfg, max_new_tokens=max_new)
    llm.generator.load()
    lg = llm.attach_vision(vit_cfg)
    lg.load()
    print(f"decoder+vision loaded in {time.time() - t0:.1f}s",
          flush=True)

    res = {}
    rng = np.random.default_rng(0)
    s = vit_cfg.image_size
    for b in (1, 8):
        pixels = rng.standard_normal((b, 3, s, s)).astype(np.float32)
        lg.encode_image(pixels)  # compile
        # device-resident arm (fetch=False, the production property:
        # serving/ingest compose on device and never copy the patch
        # embeddings to host). block_until_ready is unreliable through
        # the axon tunnel, so completion is pinned by fetching an
        # 8-byte scalar reduction each iteration instead of the
        # ~12 MB/image tensor.
        summed = jnp.sum(lg.encode_image(pixels, fetch=False))
        np.asarray(summed)
        t0 = time.time()
        for _ in range(reps * 4):
            out_d = lg.encode_image(pixels, fetch=False)
            np.asarray(jnp.sum(out_d))
        dt = (time.time() - t0) / (reps * 4)
        res[f"encode_b{b}"] = {
            "ms": round(1e3 * dt, 1),
            "images_per_s": round(b / dt, 1)}
        print(f"encode b={b} (device-resident): "
              f"{res[f'encode_b{b}']}", flush=True)
        # raw-uint8 arm (the production ingest path: resize on host,
        # upload RAW bytes — 4x smaller than normalized f32 — and
        # normalize on device inside the encode program). The upload,
        # not the ViT forward, is the measured bound: pixels resident
        # on device encode at 7.4 ms b=1 / 41.7 ms b=8.
        raw = rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8)
        np.asarray(jnp.sum(lg.encode_image(raw, fetch=False)))  # compile
        t0 = time.time()
        for _ in range(reps * 4):
            out_u = lg.encode_image(raw, fetch=False)
            np.asarray(jnp.sum(out_u))
        dt = (time.time() - t0) / (reps * 4)
        res[f"encode_u8_b{b}"] = {
            "ms": round(1e3 * dt, 1),
            "images_per_s": round(b / dt, 1)}
        print(f"encode b={b} (raw uint8, device-normalize): "
              f"{res[f'encode_u8_b{b}']}", flush=True)
        del out_u
        # host-fetch arm: the old numbers — kept to document the
        # tunnel-fetch bound for callers that insist on np.ndarray
        t0 = time.time()
        for _ in range(reps * 4):
            out = lg.encode_image(pixels)
        dt = (time.time() - t0) / (reps * 4)
        res[f"encode_fetch_b{b}"] = {
            "ms": round(1e3 * dt, 1),
            "images_per_s": round(b / dt, 1)}
        print(f"encode b={b} (host fetch): "
              f"{res[f'encode_fetch_b{b}']}", flush=True)
        del out, out_d

    from PIL import Image

    def make_png(seed: int) -> bytes:
        buf = io.BytesIO()
        Image.fromarray(np.random.default_rng(seed)
                        .integers(0, 255, (480, 640, 3))
                        .astype(np.uint8)).save(buf, format="PNG")
        return buf.getvalue()

    pngs = [make_png(i) for i in range(reps + 1)]
    prompt = ("Analyse cette image et classifie-la: SCHEMA_DPO, "
              "INFOGRAPHIE ou PHOTO_DECO. Réponds en JSON.")
    r = llm.generate_with_image(prompt, pngs[-1])  # compile + warm
    assert r.ok, r.error
    t0 = time.time()
    for i in range(reps):
        # distinct image per rep: the patch LRU never hits (cold path)
        r = llm.generate_with_image(prompt, pngs[i])
        assert r.ok, r.error
    dt = (time.time() - t0) / reps
    res["e2e_image_to_text"] = {
        "s": round(dt, 2), "new_tokens": max_new,
        "image_tokens": lg.config.num_image_tokens}
    print(f"e2e image→text ({max_new} tokens): {dt:.2f}s", flush=True)

    # the cold loop's distinct images evicted pngs[-1] from the
    # 4-entry LRU — re-enter it untimed so the loop measures pure hits
    r = llm.generate_with_image(prompt, pngs[-1])
    assert r.ok, r.error
    hits0 = lg.cache_stats["hits"]
    t0 = time.time()
    for _ in range(reps):
        # ONE repeated image: digest-keyed patch cache skips the ViT
        r = llm.generate_with_image(prompt, pngs[-1])
        assert r.ok, r.error
    dt_rep = (time.time() - t0) / reps
    res["e2e_image_repeat_cached"] = {
        "s": round(dt_rep, 2), "new_tokens": max_new,
        "cache_hits": lg.cache_stats["hits"] - hits0,
        "saved_s_vs_cold": round(dt - dt_rep, 2)}
    print(f"e2e repeat (patch cache): {dt_rep:.2f}s "
          f"(cold {dt:.2f}s)", flush=True)

    out = {"bench": "vision_on_chip", "device": str(jax.devices()[0]),
           "model": ("tiny" if TINY else
                     "CLIP-ViT-L/14-336 + 12B int8"),
           "arms": res, "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    print(json.dumps(out), flush=True)
    if not TINY:
        with open(pathlib.Path(__file__).parent / "RESULTS.jsonl",
                  "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
