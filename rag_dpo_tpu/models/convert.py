"""HF checkpoint → Flax param conversion for the encoder family.

Maps `XLMRobertaModel` torch state dicts (the backbone of BAAI/bge-m3 and
of Jina-reranker-v2-class cross-encoders) onto this package's module tree.
The environment here is zero-egress with no HF cache, so production
checkpoints can't be fetched — conversion is exercised in tests against a
randomly-initialized tiny torch XLMRobertaModel (torch-cpu is available)
to lock in numerical parity of the architecture.
"""

from __future__ import annotations

import re

import numpy as np


def _set(tree: dict, path: tuple[str, ...], value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def flatten_params(tree: dict, prefix: str = "") -> dict:
    """Nested param tree → flat {'a/b/c': ndarray} (npz-serializable)."""
    out = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            out.update(flatten_params(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def save_params_npz(params: dict, path):
    np.savez(path, **flatten_params(params))


def load_params_npz(path) -> dict:
    """npz ('/'-joined keys, as written by scripts/convert_weights.py)
    → {'params': nested tree} ready for `model.apply`."""
    flat = dict(np.load(path))
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return {"params": tree}


def convert_xlmr_state_dict(state: dict, prefix: str = "") -> dict:
    """torch state-dict (name → np.ndarray) → Flax param tree for
    `TransformerEncoder` (call with scope name 'encoder' stripped off by
    the caller's module nesting).

    Handles both bare `XLMRobertaModel` keys and `roberta.`-prefixed ones.
    Linear weights are transposed ([out,in] → [in,out]).
    """
    params: dict = {}

    def arr(name):
        v = state[prefix + name]
        return np.asarray(v)

    def has(name):
        return (prefix + name) in state

    # --- embeddings
    _set(params, ("word_embeddings", "embedding"),
         arr("embeddings.word_embeddings.weight"))
    _set(params, ("position_embeddings", "embedding"),
         arr("embeddings.position_embeddings.weight"))
    if has("embeddings.token_type_embeddings.weight"):
        _set(params, ("token_type_embeddings", "embedding"),
             arr("embeddings.token_type_embeddings.weight"))
    _set(params, ("embeddings_norm", "scale"),
         arr("embeddings.LayerNorm.weight"))
    _set(params, ("embeddings_norm", "bias"),
         arr("embeddings.LayerNorm.bias"))

    # --- layers
    layer_ids = sorted({
        int(m.group(1))
        for k in state
        if (m := re.search(r"encoder\.layer\.(\d+)\.", k))
    })
    for i in layer_ids:
        base = f"encoder.layer.{i}."
        lname = f"layer_{i}"
        for src, dst in (
            ("attention.self.query", ("attention", "query")),
            ("attention.self.key", ("attention", "key")),
            ("attention.self.value", ("attention", "value")),
            ("attention.output.dense", ("attention", "output")),
            ("intermediate.dense", ("intermediate",)),
            ("output.dense", ("mlp_output",)),
        ):
            _set(params, (lname, *dst, "kernel"),
                 arr(base + src + ".weight").T)
            _set(params, (lname, *dst, "bias"), arr(base + src + ".bias"))
        _set(params, (lname, "attention_norm", "scale"),
             arr(base + "attention.output.LayerNorm.weight"))
        _set(params, (lname, "attention_norm", "bias"),
             arr(base + "attention.output.LayerNorm.bias"))
        _set(params, (lname, "output_norm", "scale"),
             arr(base + "output.LayerNorm.weight"))
        _set(params, (lname, "output_norm", "bias"),
             arr(base + "output.LayerNorm.bias"))
    return params


def convert_bge_m3_state_dict(state: dict) -> dict:
    """Full BGE-M3 export (backbone + sparse/colbert heads) → BgeM3Model
    params. Head weights are published by FlagEmbedding as
    `sparse_linear.pt` / `colbert_linear.pt` alongside the backbone; pass
    them merged into `state` under 'sparse_linear.*' / 'colbert_linear.*'.
    """
    prefix = "roberta." if any(k.startswith("roberta.") for k in state) else ""
    params = {"encoder": convert_xlmr_state_dict(state, prefix)}
    if "sparse_linear.weight" in state:
        params["sparse_head"] = {
            "kernel": np.asarray(state["sparse_linear.weight"]).T,
            "bias": np.asarray(state["sparse_linear.bias"]),
        }
    if "colbert_linear.weight" in state:
        params["colbert_head"] = {
            "kernel": np.asarray(state["colbert_linear.weight"]).T,
            "bias": np.asarray(state["colbert_linear.bias"]),
        }
    return params


def convert_llama_state_dict(state: dict) -> dict:
    """HF `LlamaForCausalLM`/`MistralForCausalLM` torch export →
    `DecoderModel` params. Weights transposed ([out,in] → [in,out])."""
    prefix = "model." if any(k.startswith("model.") for k in state) else ""
    params: dict = {}

    def arr(name):
        return np.asarray(state[prefix + name])

    _set(params, ("embed_tokens", "embedding"),
         arr("embed_tokens.weight"))
    layer_ids = sorted({
        int(m.group(1))
        for k in state
        if (m := re.search(r"layers\.(\d+)\.", k))
    })
    for i in layer_ids:
        base = f"layers.{i}."
        lname = f"layer_{i}"
        for src, dst in (
            ("self_attn.q_proj", ("attention", "q_proj")),
            ("self_attn.k_proj", ("attention", "k_proj")),
            ("self_attn.v_proj", ("attention", "v_proj")),
            ("self_attn.o_proj", ("attention", "o_proj")),
            ("mlp.gate_proj", ("gate_proj",)),
            ("mlp.up_proj", ("up_proj",)),
            ("mlp.down_proj", ("down_proj",)),
        ):
            _set(params, (lname, *dst, "kernel"),
                 arr(base + src + ".weight").T)
        _set(params, (lname, "input_norm", "scale"),
             arr(base + "input_layernorm.weight"))
        _set(params, (lname, "post_attention_norm", "scale"),
             arr(base + "post_attention_layernorm.weight"))
    _set(params, ("final_norm", "scale"), arr("norm.weight"))
    if "lm_head.weight" in state:
        _set(params, ("lm_head", "kernel"),
             np.asarray(state["lm_head.weight"]).T)
    return params


def convert_cross_encoder_state_dict(state: dict) -> dict:
    """Sequence-classification export (backbone + scalar classifier)."""
    prefix = "roberta." if any(k.startswith("roberta.") for k in state) else ""
    params = {"encoder": convert_xlmr_state_dict(state, prefix)}
    if "classifier.dense.weight" in state:  # RoBERTa-style two-layer head
        params["head_dense"] = {
            "kernel": np.asarray(state["classifier.dense.weight"]).T,
            "bias": np.asarray(state["classifier.dense.bias"]),
        }
        params["classifier"] = {
            "kernel": np.asarray(state["classifier.out_proj.weight"]).T,
            "bias": np.asarray(state["classifier.out_proj.bias"]),
        }
    elif "classifier.weight" in state:  # bare scalar head
        params["classifier"] = {
            "kernel": np.asarray(state["classifier.weight"]).T,
            "bias": np.asarray(state["classifier.bias"]),
        }
    return params


def convert_clip_vision_state_dict(state: dict) -> dict:
    """HF `CLIPVisionModel` torch export → `ViTModel` params.

    Layout notes: the stride-P patch conv [H, 3, P, P] becomes the
    explicit patch matmul kernel [3·P², H] (channel-major per-patch
    flatten — exactly the order ViTModel packs pixels); Dense weights
    transpose [out, in] → [in, out]; HF's `pre_layrnorm` (sic) maps to
    `pre_layernorm`.
    """
    prefix = "vision_model." if any(
        k.startswith("vision_model.") for k in state) else ""
    params: dict = {}

    def arr(name):
        return np.asarray(state[prefix + name])

    conv = arr("embeddings.patch_embedding.weight")  # [H, 3, P, P]
    params["patch_kernel"] = conv.reshape(conv.shape[0], -1).T
    params["class_embedding"] = arr("embeddings.class_embedding")
    params["position_embedding"] = arr(
        "embeddings.position_embedding.weight")
    for src, dst in (("pre_layrnorm", "pre_layernorm"),
                     ("post_layernorm", "post_layernorm")):
        params[dst] = {"scale": arr(src + ".weight"),
                       "bias": arr(src + ".bias")}
    layer_ids = sorted({
        int(m.group(1))
        for k in state
        if (m := re.search(r"encoder\.layers\.(\d+)\.", k))
    })
    for i in layer_ids:
        base = f"encoder.layers.{i}."
        lp: dict = {"attention": {}}
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lp["attention"][name] = {
                "kernel": arr(base + f"self_attn.{name}.weight").T,
                "bias": arr(base + f"self_attn.{name}.bias"),
            }
        for name in ("layer_norm1", "layer_norm2"):
            lp[name] = {"scale": arr(base + name + ".weight"),
                        "bias": arr(base + name + ".bias")}
        for name in ("fc1", "fc2"):
            lp[name] = {
                "kernel": arr(base + f"mlp.{name}.weight").T,
                "bias": arr(base + f"mlp.{name}.bias"),
            }
        params[f"layer_{i}"] = lp
    return params


def convert_llava_state_dict(state: dict) -> dict:
    """HF `LlavaForConditionalGeneration` torch export → the three
    param trees of the TPU multimodal stack: `{"vision": ViTModel,
    "projector": LlavaProjector, "decoder": DecoderModel}` (see
    models/llava.py)."""
    vision = {
        k[len("vision_tower."):]: v
        for k, v in state.items() if k.startswith("vision_tower.")
    }
    decoder = {
        k[len("language_model."):]: v
        for k, v in state.items() if k.startswith("language_model.")
    }
    if not decoder:  # transformers >= 4.52 flattened layout:
        # model.language_model.* + TOP-LEVEL lm_head.weight
        decoder = {
            k[len("model.language_model."):]: v
            for k, v in state.items()
            if k.startswith("model.language_model.")
        }
        if "lm_head.weight" in state:
            decoder["lm_head.weight"] = state["lm_head.weight"]
        vision = vision or {
            k[len("model.vision_tower."):]: v
            for k, v in state.items()
            if k.startswith("model.vision_tower.")
        }
    proj_prefix = "multi_modal_projector." if any(
        k.startswith("multi_modal_projector.") for k in state) \
        else "model.multi_modal_projector."
    projector = {
        "linear_1": {
            "kernel": np.asarray(
                state[proj_prefix + "linear_1.weight"]).T,
            "bias": np.asarray(state[proj_prefix + "linear_1.bias"]),
        },
        "linear_2": {
            "kernel": np.asarray(
                state[proj_prefix + "linear_2.weight"]).T,
            "bias": np.asarray(state[proj_prefix + "linear_2.bias"]),
        },
    }
    # convert_llama_state_dict normalizes the prefix itself (it uses
    # "model." only when present), so bare stripped keys pass through
    return {
        "vision": convert_clip_vision_state_dict(vision),
        "projector": projector,
        "decoder": convert_llama_state_dict(decoder),
    }
