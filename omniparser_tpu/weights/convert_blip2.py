"""HF Salesforce/blip2-opt-2.7b safetensors -> omniparser_tpu Blip2 tree.

The mapping follows HF's published modeling_blip_2.py key structure and is
validated against a GENUINE transformers Blip2ForConditionalGeneration
state dict (tiny config, tests/test_hf_keys.py) — every key spelling and
shape is authentic, not synthesizer-circular. `unmatched` pinpoints any
drift if a future HF version renames keys.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

from omniparser_tpu.models.blip2 import BLIP2_OPT_2_7B, Blip2Dims


def _lin(w):
    return np.transpose(w, (1, 0))


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree, path, leaf, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = np.asarray(value, np.float32)


def convert_blip2_state_dict(
    sd: Dict[str, np.ndarray], dims: Blip2Dims = BLIP2_OPT_2_7B
) -> Tuple[Dict[str, Any], List[str]]:
    params: Dict[str, Any] = {}
    unmatched: List[str] = []

    for key, v in sd.items():
        k = key
        is_w = k.endswith(".weight")
        base = k.rsplit(".", 1)[0]
        leaf_w = "kernel" if is_w else "bias"
        norm_w = "scale" if is_w else "bias"

        # ---------------- vision ---------------- #
        if k == "vision_model.embeddings.class_embedding":
            _set(params, ["vision_model"], "class_embedding", v.reshape(-1))
            continue
        if k == "vision_model.embeddings.position_embedding":
            _set(params, ["vision_model"], "position_embedding", v.reshape(v.shape[-2], v.shape[-1]))
            continue
        if base == "vision_model.embeddings.patch_embedding":
            _set(params, ["vision_model", "patch_embedding"], leaf_w,
                 _conv(v) if is_w else v)
            continue
        if base == "vision_model.post_layernorm":
            _set(params, ["vision_model", "post_layernorm"], norm_w, v)
            continue
        m = re.match(r"vision_model\.encoder\.layers\.(\d+)\.(.+)$", base)
        if m:
            i, rest = m.groups()
            root = ["vision_model"]
            table = {
                "self_attn.qkv": (f"l{i}_attn", "qkv", _lin),
                "self_attn.projection": (f"l{i}_attn", "projection", _lin),
                "mlp.fc1": (None, f"l{i}_fc1", _lin),
                "mlp.fc2": (None, f"l{i}_fc2", _lin),
            }
            norms = {"layer_norm1": f"l{i}_ln1", "layer_norm2": f"l{i}_ln2"}
            if rest in table:
                sub, name, tf = table[rest]
                if sub:
                    _set(params, root + [sub, name], leaf_w, tf(v) if is_w else v)
                else:
                    _set(params, root + [name], leaf_w, tf(v) if is_w else v)
            elif rest in norms:
                _set(params, root + [norms[rest]], norm_w, v)
            else:
                unmatched.append(key)
            continue

        # ---------------- q-former ---------------- #
        if k == "query_tokens":
            _set(params, ["qformer"], "query_tokens", v)
            continue
        if base == "qformer.layernorm":
            _set(params, ["qformer", "layernorm"], norm_w, v)
            continue
        m = re.match(r"qformer\.encoder\.layer\.(\d+)\.(.+)$", base)
        if m:
            i, rest = m.groups()
            root = ["qformer"]
            attn_map = {
                "attention.attention.query": (f"l{i}_self", "query"),
                "attention.attention.key": (f"l{i}_self", "key"),
                "attention.attention.value": (f"l{i}_self", "value"),
                "attention.output.dense": (f"l{i}_self", "output_dense"),
                "crossattention.attention.query": (f"l{i}_cross", "query"),
                "crossattention.attention.key": (f"l{i}_cross", "key"),
                "crossattention.attention.value": (f"l{i}_cross", "value"),
                "crossattention.output.dense": (f"l{i}_cross", "output_dense"),
                "intermediate_query.dense": (None, f"l{i}_fc1"),
                "output_query.dense": (None, f"l{i}_fc2"),
            }
            norm_map = {
                "attention.output.LayerNorm": [f"l{i}_self", "output_ln"],
                "crossattention.output.LayerNorm": [f"l{i}_cross", "output_ln"],
                "output_query.LayerNorm": [f"l{i}_ffn_ln"],
            }
            if rest in attn_map:
                sub, name = attn_map[rest]
                path = root + ([sub, name] if sub else [name])
                _set(params, path, leaf_w, _lin(v) if is_w else v)
            elif rest in norm_map:
                _set(params, root + norm_map[rest], norm_w, v)
            else:
                unmatched.append(key)
            continue

        # ---------------- projection + language model ---------------- #
        if base == "language_projection":
            _set(params, ["language_projection"], leaf_w, _lin(v) if is_w else v)
            continue
        lk = k.removeprefix("language_model.model.decoder.").removeprefix("language_model.")
        lbase = lk.rsplit(".", 1)[0]
        if lbase == "embed_tokens":
            _set(params, ["language_model", "embed_tokens"], "embedding", v)
            continue
        if lbase == "embed_positions":
            _set(params, ["language_model", "embed_positions"], "embedding", v)
            continue
        if lbase == "final_layer_norm" and "layers" not in k:
            _set(params, ["language_model", "final_layer_norm"], norm_w, v)
            continue
        m = re.match(r"layers\.(\d+)\.(.+)$", lbase)
        if m:
            i, rest = m.groups()
            root = ["language_model", f"layer{i}"]
            dense = {"self_attn.q_proj": "q_proj", "self_attn.k_proj": "k_proj",
                     "self_attn.v_proj": "v_proj", "self_attn.out_proj": "out_proj",
                     "fc1": "fc1", "fc2": "fc2"}
            norms = {"self_attn_layer_norm": "self_attn_layer_norm",
                     "final_layer_norm": "final_layer_norm"}
            if rest in dense:
                _set(params, root + [dense[rest]], leaf_w, _lin(v) if is_w else v)
            elif rest in norms:
                _set(params, root + [norms[rest]], norm_w, v)
            else:
                unmatched.append(key)
            continue
        if lbase == "lm_head":  # tied to embed_tokens
            continue
        unmatched.append(key)

    return {"params": params}, unmatched


def load_blip2_params(path: str):
    import os

    from safetensors.numpy import load_file

    sd = {}
    for f in sorted(os.listdir(path)):
        if f.endswith(".safetensors"):
            sd.update(load_file(os.path.join(path, f)))
    variables, unmatched = convert_blip2_state_dict(sd)
    if unmatched:
        import warnings

        warnings.warn(f"{len(unmatched)} unmatched blip2 keys, e.g. {unmatched[:5]}")
    import jax

    # device-resident once: host trees re-upload per dispatch (tunnel cost)
    return jax.device_put(variables), BLIP2_OPT_2_7B, path
