"""Learned-quality loop: train the retrieval encoder on the hermetic
corpus, produce a committed checkpoint, and prove it beats random-init.

This closes the loop the reference's whole quality story is built on —
README.md:512-539 documents its retrieval quality going 70%→90.4% by
swapping in a better (pretrained) encoder. With zero egress no real
checkpoint exists in this environment, but the framework HAS a training
stack (train/contrastive.py: sharded InfoNCE; train/loop.py;
train/checkpoint.py) — so the proof is: train the tiny BGE-M3-style
encoder on the v2 synthetic corpus and show the PRODUCTION retrieval
metrics move.

No test leakage, by construction: training queries are derived from
DOCUMENT CONTENT ONLY (titles, keyword footers, body-sentence term
subsets) — the 48 eval questions never appear in training. The encoder
must generalize from content-phrased queries to natural questions, the
same transfer a real dense retriever performs.

Artifacts:
* `evals/data/trained_encoder_v2.npz` — the checkpoint, saved through
  the production npz path (models/convert.py::save_params_npz — the
  same format `bootstrap.build_stack` loads for a real deployment);
* a `results_hermetic_*.json` record with encoder="trained", gated
  like-for-like by tests/test_hermetic_regression.py, which ALSO
  asserts trained > random-init on the strict true-doc metric.
"""

from __future__ import annotations

import pathlib
import re

import numpy as np

from ..tokenize.french import tokenize_french_text

TRAINED_NPZ = (pathlib.Path(__file__).resolve().parent / "data"
               / "trained_encoder_v2.npz")

_KW_LINE = re.compile(r"Mots-clés\s*:\s*(.+?)(?:\.|$)")


def family_key(chunk_id: str) -> str:
    """Near-miss family of a chunk: `qa_X`, `twin_X`, `blend_X` and
    `nav_X` all map to `X`, so grouped batching puts an item and its
    confusable variants in the SAME InfoNCE batch (hard in-batch
    negatives — the blend rows share the item's title/keywords with a
    different body, exactly the confusion the retriever must learn to
    resolve)."""
    for pre in ("qa_", "twin_", "blend_", "nav_"):
        if chunk_id.startswith(pre):
            return chunk_id[len(pre):]
    return chunk_id


def build_training_pairs(chunks: list[dict],
                         return_groups: bool = False):
    """(query, passage) pairs from corpus content only.

    Per chunk: its title, its keyword footer, and a content-term subset
    of each body sentence each form a query whose positive is the
    chunk's full text. In-batch negatives (train/contrastive.py) then
    push different chunks apart — including the near-miss distractors,
    which are their own rows. With `return_groups`, also returns the
    per-pair family key for grouped hard-negative batching."""
    pairs: list[tuple[str, str]] = []
    groups: list[str] = []
    for c in chunks:
        n_before = len(pairs)
        text = c["text"]
        title = c.get("title") or c.get("heading") or ""
        if title:
            pairs.append((title, text))
        m = _KW_LINE.search(text)
        if m:
            pairs.append((m.group(1), text))
        body = _KW_LINE.sub("", text)
        for sent in re.split(r"(?<=[.!?])\s+", body):
            terms = tokenize_french_text(sent)
            if len(terms) < 5:
                continue
            # content-word subset, question-length: the query STYLE a
            # natural question shares (content terms, no syntax)
            pairs.append((" ".join(terms[:8]), text))
        groups.extend([family_key(c.get("chunk_id", c.get("title", "")))]
                      * (len(pairs) - n_before))
    if return_groups:
        return pairs, groups
    return pairs


def train_eval_encoder(out_npz=TRAINED_NPZ, steps: int = 800,
                       batch_size: int = 32, seq_len: int = 96,
                       learning_rate: float = 3e-4,
                       log_every: int = 50) -> dict:
    """Train on the v2 corpus and save the checkpoint through the
    production npz path. → {"loss_first", "loss_last", "n_pairs"}."""
    import tempfile

    import jax

    from ..models import BgeM3Config, EncoderConfig
    from ..models.convert import save_params_npz
    from ..parallel.mesh import create_mesh
    from ..train.contrastive import TrainConfig
    from ..train.loop import LoopConfig, train_retriever
    from . import load_qa_dataset
    from .synthetic import build_synthetic_corpus

    dataset = load_qa_dataset()
    chunks = build_synthetic_corpus(dataset)
    pairs, groups = build_training_pairs(chunks, return_groups=True)

    model_cfg = BgeM3Config(
        encoder=EncoderConfig.tiny(use_flash_attention=False),
        colbert_dim=32,
    )
    train_cfg = TrainConfig(model=model_cfg,
                            learning_rate=learning_rate,
                            warmup_steps=max(20, steps // 10))
    mesh = create_mesh()
    metrics_path = pathlib.Path(tempfile.mkdtemp()) / "metrics.jsonl"
    with tempfile.TemporaryDirectory() as ckpt_dir:
        state = train_retriever(
            pairs, train_cfg, mesh, ckpt_dir,
            loop_config=LoopConfig(batch_size=batch_size,
                                   max_steps=steps, seq_len=seq_len,
                                   checkpoint_every=steps,
                                   log_every=log_every),
            metrics_path=metrics_path,
            groups=groups,
        )
        params = jax.device_get(state.params)
    out_npz = pathlib.Path(out_npz)
    out_npz.parent.mkdir(parents=True, exist_ok=True)
    # the production checkpoint path: bootstrap.build_stack loads the
    # embedder from exactly this format (bootstrap.py:147-152)
    save_params_npz(params["params"], out_npz)

    import json

    lines = [json.loads(ln) for ln in
             metrics_path.read_text().splitlines()]
    return {
        "n_pairs": len(pairs),
        "steps": steps,
        "loss_first": lines[0]["loss"] if lines else None,
        "loss_last": lines[-1]["loss"] if lines else None,
        "accuracy_last": lines[-1]["accuracy"] if lines else None,
        "npz": str(out_npz),
    }


def load_trained_params(npz_path=TRAINED_NPZ):
    """Committed checkpoint → param tree for Embedder(params=...)."""
    from ..models.convert import load_params_npz

    return load_params_npz(npz_path)


if __name__ == "__main__":
    import json
    import os
    import sys

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    print(json.dumps(train_eval_encoder(), indent=1))
    sys.exit(0)
