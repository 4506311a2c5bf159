#!/usr/bin/env python
"""Convert HF torch checkpoints into this framework's param format.

    python scripts/convert_weights.py bge-m3    /path/to/snapshot out.npz
    python scripts/convert_weights.py reranker  /path/to/snapshot out.npz
    python scripts/convert_weights.py decoder   /path/to/snapshot out.npz \
        [--quantize-int8]

Snapshot = a local HF model directory (config.json + *.bin / *.safetensors,
e.g. from `huggingface-cli download BAAI/bge-m3`). Output is a flat npz of
the Flax param tree ('/'-joined keys) loadable with `load_params_npz`.
The converters themselves are torch-parity-tested (tests/test_models.py,
tests/test_decoder.py); this script is the batteries-included wrapper.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

# Conversion is a HOST job (torch state_dict → npz): never touch the
# TPU. The container's sitecustomize re-pins JAX_PLATFORMS=axon in
# every process, so an inherited env var is not enough — set it here,
# before anything imports jax, and pin the config too. Without this a
# dead TPU tunnel hangs the converter (and the test suite) forever.
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def load_state_dict(snapshot: pathlib.Path) -> dict:
    state: dict = {}
    safetensor_files = sorted(snapshot.glob("*.safetensors"))
    bin_files = sorted(snapshot.glob("pytorch_model*.bin")) or \
        sorted(snapshot.glob("*.pt"))
    if safetensor_files:
        from safetensors.numpy import load_file

        for f in safetensor_files:
            state.update(load_file(f))
    elif bin_files:
        import torch

        for f in bin_files:
            part = torch.load(f, map_location="cpu", weights_only=True)
            state.update({k: v.numpy() for k, v in part.items()})
    else:
        raise FileNotFoundError(
            f"no *.safetensors or pytorch_model*.bin under {snapshot}")
    # BGE-M3 ships sparse/colbert heads as sidecar .pt files
    for head in ("sparse_linear", "colbert_linear"):
        side = snapshot / f"{head}.pt"
        if side.exists():
            import torch

            part = torch.load(side, map_location="cpu",
                              weights_only=True)
            state.update({f"{head}.{k.split('.')[-1]}": v.numpy()
                          for k, v in part.items()})
    return state


from rag_dpo_tpu.models.convert import (  # noqa: E402
    flatten_params as flatten,
    load_params_npz,
)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kind",
                    choices=["bge-m3", "reranker", "decoder", "llava"])
    ap.add_argument("snapshot", type=pathlib.Path)
    ap.add_argument("out", type=pathlib.Path)
    ap.add_argument("--quantize-int8", action="store_true",
                    help="decoder only: weight-only int8")
    args = ap.parse_args()

    state = load_state_dict(args.snapshot)
    print(f"loaded {len(state)} tensors from {args.snapshot}")

    from rag_dpo_tpu.models.convert import (
        convert_bge_m3_state_dict,
        convert_cross_encoder_state_dict,
        convert_llama_state_dict,
    )

    if args.kind == "bge-m3":
        params = convert_bge_m3_state_dict(state)
    elif args.kind == "reranker":
        params = convert_cross_encoder_state_dict(state)
    elif args.kind == "llava":
        from rag_dpo_tpu.models.convert import convert_llava_state_dict

        params = convert_llava_state_dict(state)
        if args.quantize_int8:
            from rag_dpo_tpu.models.decoder import quantize_decoder_params

            params["decoder"] = quantize_decoder_params(
                params["decoder"])
    else:
        params = convert_llama_state_dict(state)
        if args.quantize_int8:
            from rag_dpo_tpu.models.decoder import quantize_decoder_params

            params = quantize_decoder_params(params)

    flat = flatten(params)
    np.savez(args.out, **flat)
    total = sum(v.size for v in flat.values())
    print(f"wrote {args.out}: {len(flat)} arrays, "
          f"{total / 1e9:.2f}B params")
    cfg_file = args.snapshot / "config.json"
    if cfg_file.exists():
        cfg = json.loads(cfg_file.read_text())
        print("model config hints:", {
            k: cfg.get(k) for k in (
                "hidden_size", "num_hidden_layers",
                "num_attention_heads", "num_key_value_heads",
                "intermediate_size", "vocab_size", "rope_theta",
            ) if k in cfg
        })
    return 0


if __name__ == "__main__":
    sys.exit(main())
