"""LLM provider factory: local / hybrid / fake modes.

Role parity with the reference's `LLMFactory.create(mode local|hybrid)` +
`MistralProvider` hosted-EU alternative (`src/utils/llm_provider.py:
243-350`): `local` uses the Ollama-compatible endpoint; `hybrid` prefers
the hosted API (EU-hosted OpenAI-style endpoint) and falls back to local;
`fake` is the deterministic test provider.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request

from .base import BaseLLMProvider, LLMResponse
from .fake import FakeLLMProvider
from .http_llm import HTTPLLMProvider


class HostedAPIProvider(BaseLLMProvider):
    """OpenAI-compatible chat-completions client (Mistral-API class:
    EU-hosted, key-authenticated). stdlib-only."""

    def __init__(self, base_url: str = "https://api.mistral.ai/v1",
                 api_key: str | None = None,
                 model: str = "mistral-small-latest",
                 timeout: float = 120.0):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key or os.environ.get("RAGDPO_API_KEY", "")
        self.model_name = model
        self.timeout = timeout

    def chat(self, messages, temperature=0.0, max_tokens=None):
        t0 = time.time()
        payload = {
            "model": self.model_name,
            "messages": list(messages),
            "temperature": temperature,
        }
        if max_tokens:
            payload["max_tokens"] = max_tokens
        req = urllib.request.Request(
            self.base_url + "/chat/completions",
            data=json.dumps(payload).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                out = json.loads(r.read())
            text = out["choices"][0]["message"]["content"]
            return LLMResponse(text, self.model_name, time.time() - t0)
        except Exception as e:
            return LLMResponse("", self.model_name, time.time() - t0,
                               error=str(e))

    def generate(self, prompt, system=None, temperature=0.0,
                 json_mode=False, max_tokens=None):
        messages = []
        if system:
            messages.append({"role": "system", "content": system})
        messages.append({"role": "user", "content": prompt})
        return self.chat(messages, temperature=temperature,
                         max_tokens=max_tokens)

    def is_available(self) -> bool:
        return bool(self.api_key)


def create_tpu_llm(*, checkpoint_path: str = "", tokenizer_path: str = "",
                   arch: str = "mistral-nemo-12b", quantize_int8: bool = True,
                   quantize_kv: bool = False,
                   scheduler: str = "direct", speculative: bool = False,
                   max_batch: int = 8, prefix_cache: int = 0,
                   prefix_block: int = 64,
                   prefix_cache_host: bool = False,
                   prefill_chunk: int = 0,
                   decode_chunk: int = 4,
                   top_p: float = 1.0,
                   request_timeout_s: float | None = None,
                   age_steps: int = 0,
                   preemption: bool = False,
                   choose_batch: int = 0,
                   model: str | None = None) -> BaseLLMProvider:
    """On-chip generation: the in-process JAX decoder as the provider.

    The reference's generator is an external Ollama process
    (`/root/reference/src/utils/llm_provider.py`); here the same model
    class (Mistral-Nemo 12B) serves from this process on the TPU.
    `scheduler`: "direct" (one decode per call), "batch" (micro-batched
    concurrent calls share one weight sweep), "continuous" (slot-pool
    engine — short answers never wait on long neighbors). `speculative`
    accelerates calls via prompt-lookup drafts — greedy slots
    losslessly by argmax-chain verify, sampled slots losslessly by
    speculative sampling (continuous scheduler). With no
    checkpoint the decoder runs random-init (tests/load benches)."""
    import dataclasses as _dc

    from ..models.decoder import DecoderConfig
    from .tpu_llm import TPULLMProvider

    if arch == "tiny":
        cfg = DecoderConfig.tiny()
    elif arch in ("mistral-nemo-12b", "mistral_nemo_12b"):
        cfg = DecoderConfig.mistral_nemo_12b()
    else:
        raise ValueError(f"unknown decoder arch preset: {arch!r}")
    if quantize_int8 and not cfg.quantize_weights:
        cfg = _dc.replace(cfg, quantize_weights=True, tie_embeddings=True)
    if quantize_kv:
        # int8 K/V rows: halves the slot pool's per-request HBM, so
        # `max_batch` can double at the same footprint (decode is
        # weight-sweep-bound — aggregate tok/s scales with slots)
        cfg = _dc.replace(cfg, quantize_kv=True)
    params = None
    if checkpoint_path:
        from ..models.convert import load_params_npz

        params = load_params_npz(checkpoint_path)
    tokenizer = None
    if tokenizer_path:
        from ..tokenize.hf import load_hf_tokenizer

        tokenizer = load_hf_tokenizer(tokenizer_path)
        if tokenizer is None:
            raise ValueError(
                f"tokenizer_path {tokenizer_path!r} could not be loaded "
                "(transformers cache missing?) — the hashed fallback "
                "tokenizer would NOT match converted real weights")
    return TPULLMProvider(
        cfg, params=params, tokenizer=tokenizer,
        model_name=model or f"tpu-decoder-{arch}",
        batch_concurrent=(scheduler == "batch"),
        continuous=(scheduler == "continuous"),
        speculative=speculative, max_batch=max_batch,
        prefix_cache=prefix_cache, prefix_block=prefix_block,
        prefix_cache_host=prefix_cache_host,
        prefill_chunk=prefill_chunk,
        decode_chunk=decode_chunk,
        top_p=top_p,
        request_timeout_s=request_timeout_s,
        age_steps=age_steps,
        preemption=preemption,
        choose_batch=choose_batch,
    )


def create_llm(mode: str = "local", *, base_url: str | None = None,
               model: str | None = None,
               api_key: str | None = None,
               **tpu_kwargs) -> BaseLLMProvider:
    """mode: local | hybrid | hosted | tpu | fake (env RAGDPO_LLM_MODE)."""
    mode = mode or os.environ.get("RAGDPO_LLM_MODE", "local")
    if mode == "fake":
        return FakeLLMProvider()
    if mode == "tpu":
        return create_tpu_llm(model=model, **tpu_kwargs)
    local = HTTPLLMProvider(
        base_url=base_url or os.environ.get("RAGDPO_LLM_BASE_URL",
                                            "http://localhost:11434"),
        model=model or os.environ.get("RAGDPO_LLM_MODEL",
                                      "mistral-nemo:12b"),
    )
    if mode == "local":
        return local
    hosted = HostedAPIProvider(api_key=api_key)
    if mode == "hosted":
        return hosted
    if mode == "hybrid":
        if hosted.is_available():
            return hosted
        if local.is_available():
            return local
        return FakeLLMProvider()
    raise ValueError(f"unknown llm mode: {mode}")
