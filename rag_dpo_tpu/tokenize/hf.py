"""HF tokenizers adapter (XLM-R sentencepiece for BGE-M3 / Jina reranker).

Gated: the environment may have no cached tokenizer files (zero egress);
`load_hf_tokenizer` returns None in that case and callers fall back to
`HashedTokenizer`. Production deployments point `path` at a local
tokenizer.json / HF snapshot.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .base import Encoded


class HFTokenizer:
    def __init__(self, fast_tokenizer):
        self._tok = fast_tokenizer
        self.pad_id = fast_tokenizer.pad_token_id or 1
        self.cls_id = fast_tokenizer.cls_token_id or 0
        self.sep_id = fast_tokenizer.sep_token_id or 2
        self.vocab_size = fast_tokenizer.vocab_size

    def encode_batch(self, texts: Sequence[str], max_len: int) -> Encoded:
        out = self._tok(
            list(texts), padding="max_length", truncation=True,
            max_length=max_len, return_tensors="np",
        )
        ids = out["input_ids"].astype(np.int32)
        lengths = out["attention_mask"].sum(axis=1).astype(np.int32)
        return Encoded(input_ids=ids, lengths=lengths)

    def encode_pairs(
        self, pairs: Sequence[tuple[str, str]], max_len: int
    ) -> Encoded:
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        out = self._tok(
            a, b, padding="max_length", truncation=True,
            max_length=max_len, return_tensors="np",
        )
        ids = out["input_ids"].astype(np.int32)
        lengths = out["attention_mask"].sum(axis=1).astype(np.int32)
        return Encoded(input_ids=ids, lengths=lengths)


def load_hf_tokenizer(path_or_name: str = "BAAI/bge-m3"):
    """Returns HFTokenizer or None when unavailable (offline, no cache)."""
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(
            path_or_name, local_files_only=True
        )
        return HFTokenizer(tok)
    except Exception:
        return None
