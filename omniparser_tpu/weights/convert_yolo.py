"""ultralytics YOLOv8 checkpoint -> omniparser_tpu Flax param tree.

The reference loads `icon_detect/model.pt` via ultralytics
(util/utils.py:71-75).  This converter accepts either

  * a plain torch state_dict file (recommended: in any env with
    ultralytics, run  `torch.save(YOLO(p).model.state_dict(), out)`), or
  * a full ultralytics .pt bundle — unpickled with stub classes so the
    ultralytics package itself is NOT required here.

Layer-index map (ultralytics DetectionModel `model.{i}` -> our module
names in models/yolov8.py):

  0 stem | 1 down2 | 2 c2f_2 | 3 down3 | 4 c2f_3 | 5 down4 | 6 c2f_4
  | 7 down5 | 8 c2f_5 | 9 sppf | 12 neck_p4 | 15 neck_p3 | 16 neck_down3
  | 18 neck_p4b | 19 neck_down4 | 21 neck_p5 | 22 head (cv2=box, cv3=cls)

DFL's fixed expectation conv (model.22.dfl) is computed analytically in
decode_predictions and has no parameters to convert.
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Dict, Tuple

import numpy as np

_LAYER_MAP = {
    "0": "stem", "1": "down2", "2": "c2f_2", "3": "down3", "4": "c2f_3",
    "5": "down4", "6": "c2f_4", "7": "down5", "8": "c2f_5", "9": "sppf",
    "12": "neck_p4", "15": "neck_p3", "16": "neck_down3", "18": "neck_p4b",
    "19": "neck_down4", "21": "neck_p5",
}


def _load_torch_tensors(path: str) -> Dict[str, np.ndarray]:
    """Best-effort load of a torch file to {key: np.ndarray} without
    requiring ultralytics classes."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # full ultralytics bundle: stub out unknown classes during unpickle
        class _Stub:
            def __init__(self, *a, **k):
                self.__dict__ = {}

            def __setstate__(self, state):
                if isinstance(state, dict):
                    self.__dict__.update(state)

        class _Unpickler(pickle.Unpickler):
            def find_class(self, module, name):
                try:
                    return super().find_class(module, name)
                except (ImportError, AttributeError):
                    return type(name, (_Stub,), {})

        import torch.serialization as ts

        with open(path, "rb") as f:
            obj = torch.load(
                f, map_location="cpu", weights_only=False,
                pickle_module=type("PM", (), {"Unpickler": _Unpickler, "load": pickle.load}),
            )
    return _flatten_state(obj)


def _flatten_state(obj) -> Dict[str, np.ndarray]:
    import torch

    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if hasattr(obj, "__dict__") and not isinstance(obj, dict):
        # stub-unpickled nn.Module graph: walk _modules/_parameters/_buffers
        flat: Dict[str, Any] = {}

        def walk(mod, prefix):
            for k, v in (getattr(mod, "_parameters", None) or {}).items():
                if v is not None:
                    flat[prefix + k] = v
            for k, v in (getattr(mod, "_buffers", None) or {}).items():
                if v is not None:
                    flat[prefix + k] = v
            for k, v in (getattr(mod, "_modules", None) or {}).items():
                if v is not None:
                    walk(v, f"{prefix}{k}.")

        walk(obj, "")
        if not flat:
            raise ValueError(
                "could not extract a state_dict; re-export with "
                "torch.save(YOLO(path).model.state_dict(), out)"
            )
        obj = flat
    out = {}
    for k, v in obj.items():
        if isinstance(v, torch.Tensor):
            out[k] = v.detach().float().numpy()
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def _convert_convbn(sd: Dict, src: str, params: Dict, stats: Dict, dst: str):
    """ultralytics Conv (conv + bn) -> our ConvBNAct {conv, bn}."""
    node_p = params.setdefault(dst, {})
    node_s = stats.setdefault(dst, {})
    node_p["conv"] = {"kernel": _conv_kernel(sd[f"{src}.conv.weight"])}
    node_p["bn"] = {"scale": sd[f"{src}.bn.weight"], "bias": sd[f"{src}.bn.bias"]}
    node_s["bn"] = {"mean": sd[f"{src}.bn.running_mean"], "var": sd[f"{src}.bn.running_var"]}


def _convert_c2f(sd: Dict, src: str, params: Dict, stats: Dict, dst: str):
    _convert_convbn(sd, f"{src}.cv1", params.setdefault(dst, {}), stats.setdefault(dst, {}), "cv1")
    _convert_convbn(sd, f"{src}.cv2", params[dst], stats[dst], "cv2")
    i = 0
    while f"{src}.m.{i}.cv1.conv.weight" in sd:
        m_p = params[dst].setdefault(f"m{i}", {})
        m_s = stats[dst].setdefault(f"m{i}", {})
        _convert_convbn(sd, f"{src}.m.{i}.cv1", m_p, m_s, "cv1")
        _convert_convbn(sd, f"{src}.m.{i}.cv2", m_p, m_s, "cv2")
        i += 1


def convert_yolo_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """ultralytics state_dict -> flax variables {'params', 'batch_stats'}."""
    sd = {k.removeprefix("model.model.").removeprefix("model."): v for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for idx, name in _LAYER_MAP.items():
        if f"{idx}.conv.weight" in sd:  # plain Conv
            _convert_convbn(sd, idx, params, stats, name)
        elif f"{idx}.cv1.conv.weight" in sd:
            if f"{idx}.m.0.cv1.conv.weight" in sd:  # C2f
                _convert_c2f(sd, idx, params, stats, name)
            else:  # SPPF
                node_p = params.setdefault(name, {})
                node_s = stats.setdefault(name, {})
                _convert_convbn(sd, f"{idx}.cv1", node_p, node_s, "cv1")
                _convert_convbn(sd, f"{idx}.cv2", node_p, node_s, "cv2")
        else:
            raise KeyError(f"layer model.{idx} missing from state_dict")

    # Detect head: model.22.cv2.{lvl} = box (2x Conv + conv2d), cv3 = cls
    head_p = params.setdefault("head", {})
    head_s = stats.setdefault("head", {})
    for lvl in range(3):
        for branch, ours in (("cv2", "box"), ("cv3", "cls")):
            src = f"22.{branch}.{lvl}"
            _convert_convbn(sd, f"{src}.0", head_p, head_s, f"{ours}{lvl}_0")
            _convert_convbn(sd, f"{src}.1", head_p, head_s, f"{ours}{lvl}_1")
            head_p[f"{ours}{lvl}_2"] = {
                "kernel": _conv_kernel(sd[f"{src}.2.weight"]),
                "bias": sd[f"{src}.2.bias"],
            }
    return {"params": params, "batch_stats": stats}


def load_detector_params(path: str, detector) -> Dict[str, Any]:
    """Load + convert + validate against the detector's init shapes."""
    import jax

    sd = _load_torch_tensors(path)
    converted = convert_yolo_state_dict(sd)
    ref = jax.eval_shape(lambda: detector.init_params(jax.random.PRNGKey(0)))
    _check_tree_shapes(ref, converted)
    # device_put: host-resident param trees are re-uploaded on EVERY
    # dispatch (tunnel cost ~100ms/call on axon)
    return jax.device_put(
        jax.tree.map(lambda x: np.asarray(x, np.float32), converted))


def _check_tree_shapes(ref, got):
    import jax

    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_flat = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_flatten_with_path(got)[0]}
    missing, mismatched = [], []
    for p, v in ref_flat:
        key = jax.tree_util.keystr(p)
        if key not in got_flat:
            missing.append(key)
        elif tuple(got_flat[key].shape) != tuple(v.shape):
            mismatched.append((key, tuple(got_flat[key].shape), tuple(v.shape)))
    if missing or mismatched:
        raise ValueError(f"converted tree mismatch: missing={missing[:8]} shapes={mismatched[:8]}")
