"""HF microsoft/Phi-3-vision safetensors -> omniparser_tpu Phi3V tree.

Key map follows HF's published modeling_phi3_v.py structure
(model.layers.N.self_attn.qkv_proj fused, mlp.gate_up_proj fused,
model.vision_embed_tokens.img_processor.vision_model CLIP tower,
img_projection Sequential MLP).  The LM half and the CLIP tower suffixes
are validated against GENUINE transformers Phi3ForCausalLM +
CLIPVisionModel state dicts (tests/test_hf_keys.py); only the
`model.vision_embed_tokens.` prefix and the 2-linear img_projection come
from microsoft/Phi-3-vision remote code and remain synthesizer-validated
(tests/test_phi3v.py). `unmatched` pinpoints drift when real weights land.

Deliberately skipped HF keys (not architecture weights we consume):
  * vision post_layernorm — features are taken from the penultimate layer
    (HF layer_idx=-2), which never passes the final LN;
  * glb_GN / sub_GN — HD-transform tile separators; the captioner path
    feeds single fixed-size crops (utils.py:145-152), no HD tiling.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

from omniparser_tpu.models.phi3v import PHI3V_BASE, Phi3VDims


def _lin(w):
    return np.transpose(w, (1, 0))


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree, path, leaf, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = np.asarray(value, np.float32)


_VIS = "model.vision_embed_tokens.img_processor.vision_model."
_SKIP = re.compile(
    # position_ids: a non-persistent CLIP buffer (arange, not a weight) that
    # some transformers versions serialize — never something to convert
    r"(post_layernorm|glb_GN|sub_GN|rotary_emb\.inv_freq|"
    r"embeddings\.position_ids)"
)


def convert_phi3v_state_dict(
    sd: Dict[str, np.ndarray], dims: Phi3VDims = PHI3V_BASE
) -> Tuple[Dict[str, Any], List[str]]:
    params: Dict[str, Any] = {}
    unmatched: List[str] = []

    for key, v in sd.items():
        k = key
        if _SKIP.search(k):
            continue
        is_w = k.endswith(".weight")
        base = k.rsplit(".", 1)[0]
        leaf_w = "kernel" if is_w else "bias"
        norm_w = "scale" if is_w else "bias"

        # ---------------- language model ---------------- #
        if k == "model.embed_tokens.weight":
            _set(params, ["embed_tokens"], "embedding", v)
            continue
        if base == "model.norm":
            _set(params, ["final_norm"], norm_w, v)
            continue
        if base == "lm_head":
            _set(params, ["lm_head"], leaf_w, _lin(v) if is_w else v)
            continue
        m = re.match(
            r"model\.layers\.(\d+)\.(self_attn\.(?:qkv_proj|o_proj)"
            r"|mlp\.(?:gate_up_proj|down_proj)"
            r"|input_layernorm|post_attention_layernorm)\.(weight|bias)", k)
        if m:
            i, mod, leaf = int(m.group(1)), m.group(2), m.group(3)
            name = mod.split(".")[-1]
            if "layernorm" in mod:
                _set(params, [f"layers_{i}", name],
                     "scale" if leaf == "weight" else "bias", v)
            else:
                _set(params, [f"layers_{i}", name],
                     "kernel" if leaf == "weight" else "bias",
                     _lin(v) if leaf == "weight" else v)
            continue

        # ---------------- projector ---------------- #
        m = re.match(r"model\.vision_embed_tokens\.img_projection\.(\d+)\.(weight|bias)", k)
        if m:
            idx, leaf = int(m.group(1)), m.group(2)
            name = {0: "proj_1", 2: "proj_2"}.get(idx)
            if name is None:
                unmatched.append(key)
                continue
            _set(params, [name], "kernel" if leaf == "weight" else "bias",
                 _lin(v) if leaf == "weight" else v)
            continue

        # ---------------- vision tower (CLIP) ---------------- #
        if k.startswith(_VIS):
            vk = k[len(_VIS):]
            if vk == "embeddings.class_embedding":
                _set(params, ["vision"], "class_embedding", v.reshape(-1))
                continue
            if vk == "embeddings.position_embedding.weight":
                _set(params, ["vision"], "position_embedding", v)
                continue
            if vk == "embeddings.patch_embedding.weight":
                _set(params, ["vision", "patch_embedding"], "kernel", _conv(v))
                continue
            if vk.startswith("pre_layrnorm"):  # HF CLIP's actual spelling
                _set(params, ["vision", "pre_layrnorm"], norm_w, v)
                continue
            m = re.match(
                r"encoder\.layers\.(\d+)\.(self_attn\.(?:q_proj|k_proj|v_proj|out_proj)"
                r"|layer_norm1|layer_norm2|mlp\.fc1|mlp\.fc2)\.(weight|bias)", vk)
            if m:
                i, mod, leaf = int(m.group(1)), m.group(2), m.group(3)
                parts = mod.split(".")
                if mod.startswith("self_attn"):
                    path = ["vision", f"layers_{i}", "self_attn", parts[1]]
                    _set(params, path, "kernel" if leaf == "weight" else "bias",
                         _lin(v) if leaf == "weight" else v)
                elif mod.startswith("layer_norm"):
                    _set(params, ["vision", f"layers_{i}", mod],
                         "scale" if leaf == "weight" else "bias", v)
                else:  # mlp.fcN
                    _set(params, ["vision", f"layers_{i}", parts[1]],
                         "kernel" if leaf == "weight" else "bias",
                         _lin(v) if leaf == "weight" else v)
                continue
            unmatched.append(key)
            continue

        unmatched.append(key)

    return {"params": params}, unmatched


def load_phi3v_params(path: str, dims: Phi3VDims = PHI3V_BASE):
    """Load + convert + shape-validate + device_put."""
    import os

    import jax
    import jax.numpy as jnp

    from safetensors.numpy import load_file

    from omniparser_tpu.models.phi3v import Phi3V

    sd: Dict[str, np.ndarray] = {}
    for f in sorted(os.listdir(path)):
        if f.endswith(".safetensors"):
            sd.update(load_file(os.path.join(path, f)))
    variables, unmatched = convert_phi3v_state_dict(sd, dims)
    if unmatched:
        import warnings

        warnings.warn(f"{len(unmatched)} unmatched phi3v keys, e.g. {unmatched[:5]}")
    model = Phi3V(dims=dims)
    ref = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, dims.image_size, dims.image_size, 3), jnp.float32),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
        None, method=Phi3V.forward_prompt))
    from omniparser_tpu.weights.convert_yolo import _check_tree_shapes

    _check_tree_shapes(ref, variables)
    # device-resident once: host trees re-upload per dispatch (tunnel cost)
    return jax.device_put(variables)
