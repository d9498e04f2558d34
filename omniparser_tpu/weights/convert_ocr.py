"""easyocr checkpoint converters: CRAFT detection (`craft_mlt_25k.pth`) and
the english_g2 VGG-BiLSTM-CTC recognizer -> models/ocr_easy Flax trees.

The reference loads these exact checkpoints via `easyocr.Reader(['en'])`
(util/utils.py:20-22).  Key schema follows the public model definitions
(clovaai/CRAFT-pytorch craft.py + basenet/vgg16_bn.py; JaidedAI/EasyOCR
model/modules): mechanical key map + NCHW->HWIO transposes, shape-checked
against the Flax modules.  tests/test_convert_ocr.py proves numeric parity
against torch restatements of the same architectures.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv_w(w) -> np.ndarray:
    """torch Conv2d [O,I,kh,kw] -> flax [kh,kw,I,O]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0)))


def _linear_w(w) -> np.ndarray:
    """torch Linear [O,I] -> flax [I,O]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32)))


def _strip_module(sd: Dict[str, Any]) -> Dict[str, Any]:
    """DataParallel checkpoints prefix every key with 'module.'."""
    return {k.removeprefix("module."): v for k, v in sd.items()}


def _convbn(sd, conv_key: str, bn_key: str | None, params: Dict, stats: Dict,
            name: str, bias: bool = True) -> None:
    p: Dict[str, Any] = {"conv": {"kernel": _conv_w(sd[f"{conv_key}.weight"])}}
    if bias:
        p["conv"]["bias"] = np.asarray(sd[f"{conv_key}.bias"], np.float32)
    if bn_key is not None:
        p["bn"] = {
            "scale": np.asarray(sd[f"{bn_key}.weight"], np.float32),
            "bias": np.asarray(sd[f"{bn_key}.bias"], np.float32),
        }
        stats[name] = {"bn": {
            "mean": np.asarray(sd[f"{bn_key}.running_mean"], np.float32),
            "var": np.asarray(sd[f"{bn_key}.running_var"], np.float32),
        }}
    params[name] = p


def convert_craft_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """CRAFT torch state dict -> Flax variables for models/ocr_easy.Craft."""
    sd = _strip_module(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # vgg16_bn slices: (torch Sequential index pairs conv,bn) -> flax names
    base_p: Dict[str, Any] = {}
    base_s: Dict[str, Any] = {}
    vgg_map = [
        ("slice1.0", "slice1.1", "s1c0"), ("slice1.3", "slice1.4", "s1c1"),
        ("slice1.7", "slice1.8", "s1c2"), ("slice1.10", "slice1.11", "s1c3"),
        ("slice2.14", "slice2.15", "s2c0"), ("slice2.17", "slice2.18", "s2c1"),
        ("slice3.20", "slice3.21", "s3c0"), ("slice3.24", "slice3.25", "s3c1"),
        ("slice3.27", "slice3.28", "s3c2"),
        ("slice4.30", "slice4.31", "s4c0"), ("slice4.34", "slice4.35", "s4c1"),
        ("slice4.37", "slice4.38", "s4c2"),
    ]
    for conv, bn, name in vgg_map:
        _convbn(sd, f"basenet.{conv}", f"basenet.{bn}", base_p, base_s, name)
    _convbn(sd, "basenet.slice5.1", None, base_p, base_s, "s5c0")
    _convbn(sd, "basenet.slice5.2", None, base_p, base_s, "s5c1")
    params["basenet"] = base_p
    stats["basenet"] = base_s

    # upconv double_convs: torch Sequential(Conv,BN,ReLU,Conv,BN,ReLU)
    for i in range(1, 5):
        up_p: Dict[str, Any] = {}
        up_s: Dict[str, Any] = {}
        _convbn(sd, f"upconv{i}.conv.0", f"upconv{i}.conv.1", up_p, up_s, "c0")
        _convbn(sd, f"upconv{i}.conv.3", f"upconv{i}.conv.4", up_p, up_s, "c1")
        params[f"upconv{i}"] = up_p
        stats[f"upconv{i}"] = up_s

    for idx, name in [(0, "cls0"), (2, "cls1"), (4, "cls2"), (6, "cls3"), (8, "cls4")]:
        _convbn(sd, f"conv_cls.{idx}", None, params, stats, name)

    return {"params": params, "batch_stats": stats}


def convert_easyocr_rec_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """english_g2-style VGG-BiLSTM-CTC state dict -> Flax variables for
    models/ocr_easy.VggCtcRecognizer."""
    sd = _strip_module(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    feat_map = [
        ("ConvNet.0", None, "f0"), ("ConvNet.3", None, "f1"),
        ("ConvNet.6", None, "f2"), ("ConvNet.8", None, "f3"),
        ("ConvNet.11", "ConvNet.12", "f4"), ("ConvNet.14", "ConvNet.15", "f5"),
        ("ConvNet.18", None, "f6"),
    ]
    for conv, bn, name in feat_map:
        bias = bn is None  # the BN'd convs are bias-free in easyocr's VGG
        _convbn(sd, f"FeatureExtraction.{conv}",
                f"FeatureExtraction.{bn}" if bn else None,
                params, stats, name, bias=bias)

    def lstm(prefix: str, suffix: str) -> Dict[str, Any]:
        return {
            "weight_ih": np.asarray(sd[f"{prefix}.rnn.weight_ih_l0{suffix}"], np.float32),
            "weight_hh": np.asarray(sd[f"{prefix}.rnn.weight_hh_l0{suffix}"], np.float32),
            "bias_ih": np.asarray(sd[f"{prefix}.rnn.bias_ih_l0{suffix}"], np.float32),
            "bias_hh": np.asarray(sd[f"{prefix}.rnn.bias_hh_l0{suffix}"], np.float32),
        }

    for i in (0, 1):
        prefix = f"SequenceModeling.{i}"
        params[f"rnn{i}"] = {
            "fwd": lstm(prefix, ""),
            "bwd": lstm(prefix, "_reverse"),
            "linear": {
                "kernel": _linear_w(sd[f"{prefix}.linear.weight"]),
                "bias": np.asarray(sd[f"{prefix}.linear.bias"], np.float32),
            },
        }
    params["pred"] = {
        "kernel": _linear_w(sd["Prediction.weight"]),
        "bias": np.asarray(sd["Prediction.bias"], np.float32),
    }
    return {"params": params, "batch_stats": stats}


def _check_against(variables: Dict[str, Any], module, example_shape) -> None:
    """Shape-check a converted tree against the module's init shapes."""
    import jax
    import jax.numpy as jnp

    from omniparser_tpu.weights.convert_yolo import _check_tree_shapes

    ref = jax.eval_shape(
        lambda r: module.init(r, jnp.zeros(example_shape), train=False),
        jax.random.PRNGKey(0),
    )
    _check_tree_shapes(ref, variables)


def load_easyocr_weights(
    craft_path: str | None = None, rec_path: str | None = None
) -> Tuple[Dict[str, Any] | None, Dict[str, Any] | None]:
    """Load .pth checkpoints (torch CPU) and convert.  Either may be None."""
    import torch

    from omniparser_tpu.models.ocr_easy import Craft, VggCtcRecognizer

    det_vars = rec_vars = None
    if craft_path:
        sd = torch.load(craft_path, map_location="cpu", weights_only=True)
        det_vars = convert_craft_state_dict(
            {k: v.numpy() for k, v in sd.items()}
        )
        _check_against(det_vars, Craft(), (1, 64, 64, 3))
    if rec_path:
        sd = torch.load(rec_path, map_location="cpu", weights_only=True)
        rec_vars = convert_easyocr_rec_state_dict(
            {k: v.numpy() for k, v in sd.items()}
        )
        _check_against(rec_vars, VggCtcRecognizer(), (1, 64, 128, 1))
    return det_vars, rec_vars
