import json
import subprocess
import sys

import pytest

from rag_dpo_tpu.ingest.images import ImageClassifier, ImageDecision
from rag_dpo_tpu.providers.base import LLMResponse
from rag_dpo_tpu.providers.factory import HostedAPIProvider, create_llm
from rag_dpo_tpu.providers import FakeLLMProvider


def test_factory_fake_mode():
    llm = create_llm("fake")
    assert llm.generate("test").ok


def test_factory_hybrid_falls_back_to_fake(monkeypatch):
    monkeypatch.delenv("RAGDPO_API_KEY", raising=False)
    # no hosted key, local endpoint unreachable → fake
    monkeypatch.setenv("RAGDPO_LLM_BASE_URL", "http://127.0.0.1:1")
    llm = create_llm("hybrid")
    assert llm.model_name == "fake-deterministic"


def test_factory_unknown_mode():
    with pytest.raises(ValueError):
        create_llm("quantum")


def test_hosted_provider_error_in_band():
    p = HostedAPIProvider(base_url="http://127.0.0.1:1", api_key="k")
    resp = p.generate("bonjour")
    assert not resp.ok and resp.error


def test_image_classifier_vision_path():
    class Vision(FakeLLMProvider):
        def generate_with_image(self, prompt, image_bytes, temperature=0.0):
            return LLMResponse(json.dumps({"classe": "PHOTO_DECO"}))

    clf = ImageClassifier(vision_llm=Vision())
    d = clf.classify(b"\x89PNG fake")
    # no pytesseract in this env → straight to vision
    assert d.label == "PHOTO_DECO" and d.method == "vision"
    assert not d.keep


def test_image_classifier_default_keeps():
    d = ImageClassifier().classify(b"\x89PNG fake")
    assert d.label == "INFOGRAPHIE" and d.keep


def test_image_manifest_filtering(tmp_path):
    img = tmp_path / "a.png"
    img.write_bytes(b"\x89PNG fake")

    class Vision(FakeLLMProvider):
        def generate_with_image(self, *a, **k):
            return LLMResponse(json.dumps({"classe": "PHOTO_DECO"}))

    docs = [
        {"doc_id": "im1", "kind": "image", "path": str(img)},
        {"doc_id": "h1", "kind": "html", "path": "x"},
    ]
    out = ImageClassifier(vision_llm=Vision()).classify_manifest(docs)
    assert [d["doc_id"] for d in out["kept"]] == ["h1"]
    assert out["report"]["im1"]["label"] == "PHOTO_DECO"


def test_package_and_download_index_roundtrip(tmp_path):
    """scripts/package_index.py + download_index.py over a real index."""
    import numpy as np

    from rag_dpo_tpu.index import DeviceIndex, IndexConfig

    idx = DeviceIndex(IndexConfig(dim=8, ell_width=4, row_block=4))
    rng = np.random.default_rng(0)
    idx.add([f"c{i}" for i in range(6)],
            rng.standard_normal((6, 8)).astype(np.float32),
            [{"nature": "GUIDE"}] * 6)
    index_dir = tmp_path / "index"
    idx.save(index_dir)

    out_zip = tmp_path / "pkg.zip"
    r = subprocess.run(
        [sys.executable, "scripts/package_index.py",
         "--index-dir", str(index_dir), "--out", str(out_zip)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    meta = json.loads(r.stdout.strip().splitlines()[-1])
    assert meta["sha256"]

    dest = tmp_path / "restored"
    r = subprocess.run(
        [sys.executable, "scripts/download_index.py", str(out_zip),
         "--dest", str(dest)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    idx2 = DeviceIndex.load(dest)
    assert idx2.n_rows == 6
    # corrupted hash rejected
    r = subprocess.run(
        [sys.executable, "scripts/download_index.py", str(out_zip),
         "--dest", str(tmp_path / "x"), "--sha256", "0" * 64],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 1


def test_tpu_llm_batches_concurrent_generates():
    """batch_concurrent=True must aggregate same-bucket requests into one
    batched decode and return exactly the unbatched greedy outputs."""
    import threading

    import jax.numpy as jnp

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    cfg = DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                             dtype=jnp.float32)
    plain = TPULLMProvider(cfg, max_new_tokens=5)
    batched = TPULLMProvider(cfg, params=plain.generator.load(),
                             max_new_tokens=5, batch_concurrent=True,
                             max_wait_ms=60.0)
    prompts = [f"question numéro {i} sur le registre des traitements"
               for i in range(4)]
    want = [plain.generate(p).text for p in prompts]

    got = {}

    def call(i):
        got[i] = batched.generate(prompts[i]).text

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert [got[i] for i in range(4)] == want
    stats = batched._batcher.stats
    assert stats.n_requests == 4
    assert stats.n_device_calls < 4, "requests must have batched"
    batched._batcher.close()


def test_factory_tpu_mode_direct():
    """create_llm("tpu") builds the on-chip decoder provider from config
    kwargs (arch preset, scheduler, speculative) — reference parity:
    LLMFactory.create + the external Ollama generator collapse into one
    in-process provider."""
    llm = create_llm("tpu", arch="tiny", quantize_int8=False)
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    assert isinstance(llm, TPULLMProvider)
    assert llm._batcher is None and llm._driver is None
    assert llm._spec is None
    r = llm.generate("Question RGPD ?", temperature=0.0, max_tokens=4)
    assert r.error is None and isinstance(r.text, str)


def test_factory_tpu_mode_schedulers_and_spec():
    llm = create_llm("tpu", arch="tiny", quantize_int8=False,
                     scheduler="batch", speculative=True, max_batch=4)
    assert llm._batcher is not None
    assert llm._spec is not None
    cont = create_llm("tpu", arch="tiny", quantize_int8=False,
                      scheduler="continuous", max_batch=4)
    assert cont._driver is not None
    with pytest.raises(ValueError):
        create_llm("tpu", arch="nope")
    with pytest.raises(ValueError):
        create_llm("tpu", arch="tiny", quantize_int8=False,
                   tokenizer_path="/nonexistent/tokenizer")


def test_config_tpu_llm_section_env_overlay(monkeypatch):
    """RAGDPO_LLM_* env vars reach the tpu-mode fields through the
    unified config (utils/config.py overlay)."""
    from rag_dpo_tpu.utils.config import load_config

    cfg = load_config(env={
        "RAGDPO_LLM_MODE": "tpu",
        "RAGDPO_LLM_ARCH": "tiny",
        "RAGDPO_LLM_SCHEDULER": "continuous",
        "RAGDPO_LLM_SPECULATIVE": "true",
        "RAGDPO_LLM_QUANTIZE_INT8": "false",
        "RAGDPO_LLM_MAX_BATCH": "16",
    })
    assert cfg.llm.mode == "tpu"
    assert cfg.llm.arch == "tiny"
    assert cfg.llm.scheduler == "continuous"
    assert cfg.llm.speculative is True
    assert cfg.llm.quantize_int8 is False
    assert cfg.llm.max_batch == 16


def test_tpu_llm_oversized_max_tokens_degrades():
    """max_tokens beyond the decoder context must clamp (shorter
    output), not crash encode_batch with a negative prompt budget —
    found by driving the demo pipeline (max_tokens sized for a 16k
    production model) over a tiny-context provider."""
    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

    cfg = DecoderConfig.tiny()   # max_seq_len=128
    for kw in ({}, {"speculative": True, "draft_len": 4}):
        p = TPULLMProvider(cfg, max_new_tokens=16, **kw)
        r = p.generate("Question RGPD " * 50, temperature=0.0,
                       max_tokens=4096)
        assert r.error is None, (kw, r.error)
        s = "".join(p.generate_stream("Question RGPD " * 50,
                                      max_tokens=4096))
        assert isinstance(s, str)
