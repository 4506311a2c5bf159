"""TPU-native LLM provider: generation served on-chip.

Drop-in `BaseLLMProvider` whose backend is the in-process JAX decoder
(`models.decoder` + `models.generate`) instead of an HTTP sidecar. With
converted Mistral/Llama weights and a real tokenizer this serves the same
role as the reference's Ollama process; with random weights it still
exercises the full generation machinery (tests, load benchmarks).
"""

from __future__ import annotations

import time

from ..models.decoder import DecoderConfig
from ..models.generate import SamplingConfig, TextGenerator
from ..tokenize import HashedTokenizer, Tokenizer
from ..tokenize.base import bucket_length
from .base import BaseLLMProvider, LLMResponse


class TPULLMProvider(BaseLLMProvider):
    def __init__(
        self,
        config: DecoderConfig | None = None,
        params=None,
        tokenizer: Tokenizer | None = None,
        max_new_tokens: int = 256,
        model_name: str = "tpu-decoder",
    ):
        self.config = config or DecoderConfig.tiny()
        self.generator = TextGenerator(self.config, params=params)
        self.tokenizer = tokenizer or HashedTokenizer(
            vocab_size=self.config.vocab_size)
        self.max_new_tokens = max_new_tokens
        self.model_name = model_name

    def load_converted(self, state_dict):
        self.generator.load_converted(state_dict)

    def _decode_text(self, token_ids) -> str:
        tok = self.tokenizer
        if hasattr(tok, "_tok"):  # HF fast tokenizer adapter
            return tok._tok.decode(
                [int(t) for t in token_ids
                 if int(t) not in (tok.pad_id, tok.sep_id)],
                skip_special_tokens=True,
            )
        # hashed tokenizer has no inverse — emit id stream (tests only)
        return " ".join(
            str(int(t)) for t in token_ids
            if int(t) not in (tok.pad_id, tok.sep_id)
        )

    def generate(self, prompt, system=None, temperature=0.0,
                 json_mode=False, max_tokens=None) -> LLMResponse:
        t0 = time.time()
        try:
            text = f"{system}\n\n{prompt}" if system else prompt
            budget = self.config.max_seq_len - (
                max_tokens or self.max_new_tokens) - 1
            enc = self.tokenizer.encode_batch(
                [text], min(bucket_length(len(text) // 3 + 2), budget))
            sampling = SamplingConfig(
                temperature=temperature,
                max_new_tokens=max_tokens or self.max_new_tokens,
                eos_id=self.tokenizer.sep_id,
                pad_id=self.tokenizer.pad_id,
            )
            tokens = self.generator.generate_ids(
                enc.input_ids, enc.lengths, sampling)
            return LLMResponse(self._decode_text(tokens[0]),
                               self.model_name, time.time() - t0)
        except Exception as e:
            return LLMResponse("", self.model_name, time.time() - t0,
                               error=str(e))

    def is_available(self) -> bool:
        return True
