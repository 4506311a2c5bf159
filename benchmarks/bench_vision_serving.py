"""Multimodal continuous batching under load: vision requests decode
CO-RESIDENT with text traffic in the 12B int8 slot pool.

What this proves on hardware (the feature landed in round 3 item 31):
a `generate_with_image` request composes its prefix on device (ViT →
projector → splice), prefills via the embeds program, and then shares
the SAME weight sweeps as every text request — so image traffic no
longer steals the chip from serving (the old direct path serialized
the whole pool behind each image), and text traffic keeps flowing
while images decode.

Arms:
  text_solo      — one text request, pool idle (latency floor)
  vision_solo    — one image request through the pool (incl. PIL
                   decode + CLIP preprocess + ViT + 64-token decode)
  vision_ttft    — time to FIRST streamed delta of an image request
                   (generate_with_image_stream): compose + prefill +
                   first weight sweep; the reference's vision calls
                   (Ollama LLaVA) block until the full answer
  mixed_16       — 16 workers: 12 text + 4 vision concurrently; per-
                   class latency vs solo, aggregate tok/s, occupancy

Random-init weights (zero-egress image): token QUALITY is meaningless;
scheduling, shapes and token COUNT are real.

Run on the real chip:  python benchmarks/bench_vision_serving.py
Tiny CPU smoke:        BENCH_TINY=1 python benchmarks/bench_vision_serving.py
"""

import dataclasses
import io
import json
import os
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("BENCH_TINY"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

TINY = bool(os.environ.get("BENCH_TINY"))
SLOTS = 16
MAX_NEW = 8 if TINY else 64
N_TEXT, N_VISION = (3, 2) if TINY else (12, 4)

TEXT_PROMPTS = [
    "Quel est le délai de notification d'une violation de données ?",
    "Quelles sont les obligations du responsable de traitement ?",
    "Faut-il une AIPD pour un traitement de vidéosurveillance ?",
    "Quels sont les droits des personnes concernées ?",
    "Quelles sanctions la CNIL peut-elle prononcer ?",
    "Comment encadrer un transfert de données hors UE ?",
]
VISION_PROMPT = ("Analyse cette image et classifie-la: SCHEMA_DPO, "
                 "INFOGRAPHIE ou PHOTO_DECO. Réponds en JSON.")


def main():
    from PIL import Image

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.models.vit import ViTConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    if TINY:
        cfg = DecoderConfig.tiny()
        vit_cfg = ViTConfig.tiny()
    else:
        cfg = dataclasses.replace(
            DecoderConfig.mistral_nemo_12b(), quantize_weights=True,
            tie_embeddings=True, max_seq_len=1536,
            param_dtype=jnp.bfloat16, quantize_kv=True)
        vit_cfg = ViTConfig.clip_vit_l_336()

    t0 = time.time()
    llm = TPULLMProvider(cfg, max_new_tokens=MAX_NEW, continuous=True,
                         max_batch=SLOTS, speculative=True,
                         prefix_cache=4, prefill_chunk=256,
                         decode_chunk=8)
    llm.generator.load()
    lg = llm.attach_vision(vit_cfg)
    lg.load()
    lg.image_cache = 0          # every image pays the full ViT path:
    #                             this bench measures the cold lane
    print(f"decoder+vision loaded in {time.time() - t0:.1f}s",
          flush=True)
    eng = llm._driver.engine

    def make_png(seed: int) -> bytes:
        buf = io.BytesIO()
        Image.fromarray(np.random.default_rng(seed)
                        .integers(0, 255, (480, 640, 3))
                        .astype(np.uint8)).save(buf, format="PNG")
        return buf.getvalue()

    pngs = [make_png(i) for i in range(max(N_VISION, 2) * 3)]

    # warm: pool programs, one text shape pass, one vision request
    # (ViT + splice + embeds-prefill compiles), one streamed request
    t0 = time.time()
    llm.warm_decoder()
    for q in TEXT_PROMPTS:
        r = llm.generate(q, max_tokens=MAX_NEW)
        assert r.ok, r.error
    r = llm.generate_with_image(VISION_PROMPT, pngs[0])
    assert r.ok, r.error
    list(llm.generate_with_image_stream(VISION_PROMPT, pngs[1]))
    print(f"warm done in {time.time() - t0:.1f}s", flush=True)

    res = {}
    reps = 2 if TINY else 4

    t0 = time.time()
    for i in range(reps):
        r = llm.generate(TEXT_PROMPTS[i % len(TEXT_PROMPTS)],
                         max_tokens=MAX_NEW)
        assert r.ok, r.error
    res["text_solo_s"] = round((time.time() - t0) / reps, 2)

    t0 = time.time()
    for i in range(reps):
        r = llm.generate_with_image(VISION_PROMPT, pngs[i])
        assert r.ok, r.error
    res["vision_solo_s"] = round((time.time() - t0) / reps, 2)

    ttfts = []
    for i in range(reps):
        t0 = time.time()
        s = llm.generate_with_image_stream(VISION_PROMPT, pngs[i])
        next(iter(s))
        ttfts.append(time.time() - t0)
        s.close()
    res["vision_ttft_s"] = round(float(np.mean(ttfts)), 2)
    res["vision_ttft_vs_solo"] = round(
        res["vision_solo_s"] / max(res["vision_ttft_s"], 1e-9), 2)

    # --- mixed load: N_TEXT text + N_VISION vision workers, 2 passes
    lock = threading.Lock()
    t_lats, v_lats, fails = [], [], []

    def tw(wid: int):
        for k in range(2):
            try:
                t0 = time.time()
                r = llm.generate(
                    TEXT_PROMPTS[(wid + k) % len(TEXT_PROMPTS)],
                    max_tokens=MAX_NEW)
                assert r.ok, r.error
                with lock:
                    t_lats.append(time.time() - t0)
            except Exception as exc:  # noqa: BLE001
                with lock:
                    fails.append(repr(exc)[:200])

    def vw(wid: int):
        for k in range(2):
            try:
                t0 = time.time()
                r = llm.generate_with_image(
                    VISION_PROMPT, pngs[wid * 2 + k])
                assert r.ok, r.error
                with lock:
                    v_lats.append(time.time() - t0)
            except Exception as exc:  # noqa: BLE001
                with lock:
                    fails.append(repr(exc)[:200])

    tk0 = eng.stats["tokens"]
    oc0, st0 = eng.stats["occupancy_sum"], eng.stats["steps"]
    threads = ([threading.Thread(target=tw, args=(i,))
                for i in range(N_TEXT)]
               + [threading.Thread(target=vw, args=(i,))
                  for i in range(N_VISION)])
    t0 = time.time()
    [t.start() for t in threads]
    [t.join() for t in threads]
    wall = time.time() - t0
    if fails:
        print(f"FAILED {len(fails)}; first: {fails[0]}", flush=True)
    res["mixed_16"] = {
        "wall_s": round(wall, 2),
        "text_requests": len(t_lats), "vision_requests": len(v_lats),
        "failed": len(fails),
        "text_mean_s": round(float(np.mean(t_lats)), 2),
        "vision_mean_s": round(float(np.mean(v_lats)), 2),
        "text_slowdown_vs_solo": round(
            float(np.mean(t_lats)) / res["text_solo_s"], 2),
        "vision_slowdown_vs_solo": round(
            float(np.mean(v_lats)) / res["vision_solo_s"], 2),
        "rpm": round(60 * (len(t_lats) + len(v_lats)) / wall, 1),
        "tok_per_s": round((eng.stats["tokens"] - tk0) / wall, 1),
        "mean_occupancy": round(
            (eng.stats["occupancy_sum"] - oc0)
            / max(eng.stats["steps"] - st0, 1), 2)}
    print("mixed:", res["mixed_16"], flush=True)

    out = {"bench": "vision_serving_pool",
           "device": str(jax.devices()[0]),
           "model": ("tiny" if TINY else
                     "CLIP-ViT-L/14-336 + 12B int8, int8 KV"),
           "slots": SLOTS, "max_new_tokens": MAX_NEW, "arms": res,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    print(json.dumps(out), flush=True)
    llm._driver.close()
    if not TINY:
        with open(pathlib.Path(__file__).parent / "RESULTS.jsonl",
                  "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
