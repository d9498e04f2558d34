"""Pin the Phi-3V converter against the checked-in authoritative manifest.

The remote-code half of microsoft/Phi-3-vision (the vision_embed_tokens
prefix + 2-linear img_projection) has no first-party transformers class to
validate against, so the authoritative key names + shapes are checked in
as data (weights/manifests/phi3v_vision_prefix.json, transcribed from the
public checkpoint's safetensors index) and the converter must consume
them exactly — VERDICT r2 #5.  The transformers-class halves are pinned
separately in tests/test_hf_keys.py.
"""

import json
import os

import numpy as np

from omniparser_tpu.models.phi3v import PHI3V_BASE
from omniparser_tpu.weights.convert_phi3v import convert_phi3v_state_dict

_MANIFEST = os.path.join(
    os.path.dirname(__file__), "..", "omniparser_tpu", "weights",
    "manifests", "phi3v_vision_prefix.json",
)


def _load():
    with open(_MANIFEST) as f:
        return json.load(f)


def test_prefix_keys_consumed_with_manifest_shapes():
    man = _load()
    sd = {k: np.zeros(shape, np.float32)
          for k, shape in man["consumed"].items()}
    variables, unmatched = convert_phi3v_state_dict(sd, PHI3V_BASE)
    assert unmatched == [], f"manifest keys the converter missed: {unmatched}"
    p = variables["params"]
    # torch [out,in] -> flax kernel [in,out]
    assert p["proj_1"]["kernel"].shape == (4096, 3072)
    assert p["proj_1"]["bias"].shape == (3072,)
    assert p["proj_2"]["kernel"].shape == (3072, 3072)
    assert p["proj_2"]["bias"].shape == (3072,)


def test_skipped_keys_are_skipped_not_unmatched():
    man = _load()
    sd = {k: np.zeros(shape, np.float32)
          for k, shape in man["skipped"].items()}
    _, unmatched = convert_phi3v_state_dict(sd, PHI3V_BASE)
    # HD-transform tile separators: deliberately unused (single fixed-size
    # crops, no HD tiling) but must be RECOGNIZED, not reported as drift
    assert unmatched == [], f"skipped keys misreported as unmatched: {unmatched}"


def test_clip_prefix_spelling_recognized():
    """The exact vision_model prefix spelling (including transformers'
    historical `pre_layrnorm` typo, which the checkpoint preserves) must
    be consumed or deliberately skipped — never unmatched."""
    man = _load()
    d = PHI3V_BASE
    shapes = {
        "embeddings.class_embedding": (d.vision_width,),
        "embeddings.patch_embedding.weight": (
            d.vision_width, 3, d.patch_size, d.patch_size),
        "embeddings.position_embedding.weight": (
            (d.image_size // d.patch_size) ** 2 + 1, d.vision_width),
        "pre_layrnorm.weight": (d.vision_width,),
        "encoder.layers.0.self_attn.q_proj.weight": (
            d.vision_width, d.vision_width),
        "encoder.layers.0.mlp.fc1.weight": (d.vision_mlp, d.vision_width),
        "post_layernorm.weight": (d.vision_width,),
    }
    prefix = man["clip_prefix"]
    for full_key in man["clip_prefix_example_keys"]:
        assert full_key.startswith(prefix)
        suffix = full_key.removeprefix(prefix)
        assert suffix in shapes, f"manifest example {suffix} missing a shape"
        sd = {full_key: np.zeros(shapes[suffix], np.float32)}
        _, unmatched = convert_phi3v_state_dict(sd, PHI3V_BASE)
        assert unmatched == [], f"{full_key} not recognized"
