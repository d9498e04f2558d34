"""YOLOv9 (GELAN) TorchScript / state_dict -> omniparser_tpu Flax tree.

The reference loads `icon_detect_v3/model.pt` as an opaque `torch.jit`
graph (/root/reference/util/yolov9.py:50).  TorchScript archives preserve
the original module names, so the state dict carries yolov9-repo
spellings (`model.{i}.cv1.conv.weight`, ...).  This converter maps them
onto models/yolov9.GELAN:

  * top-level layers are matched by ORDER over the parametric layers
    (Silence/Upsample/Concat own no params; the deploy-form topology
    order equals our module order), so it is robust to the yaml's exact
    layer indices;
  * sub-module spellings translate mechanically (ELAN `cv2.0/cv2.1` ->
    `cv2_csp/cv2_conv`, `m.{i}` -> `m{i}`, head `cv2/cv3` ->
    `box*/cls*`);
  * deploy-fused RepConvN convs (weight+bias, BN folded) load into our
    ConvBNAct as an identity BatchNorm carrying the bias.

Every unmatched source key and every unfilled target leaf is an ERROR
(reported together), never a silent skip: the real icon_detect_v3
artifact is not available in this environment, so drift must fail loudly
rather than half-load.  Shape validation runs against the detector's own
init tree before returning.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

# our module order == the deploy graph's parametric-layer order.
# Single form (gelan-c): 17 parametric layers.  Dual form (gelan-e /
# icon_detect_v3): 31 — backbone A, five CBLinear taps, backbone B with
# CBFuse sites (parameterless, not listed), shared neck/head names.
_MODULE_ORDER = (
    "stem", "down2", "elan2", "adown3", "elan3", "adown4", "elan4",
    "adown5", "elan5", "sppelan", "neck_p4", "neck_p3", "neck_down3",
    "neck_p4b", "neck_down4", "neck_p5", "head",
)
_MODULE_ORDER_DUAL = (
    "stemA", "downA2", "elanA2", "adownA3", "elanA3", "adownA4", "elanA4",
    "adownA5", "elanA5", "cb1", "cb2", "cb3", "cb4", "cb5",
    "stemB", "downB2", "elanB2", "adownB3", "elanB3", "adownB4", "elanB4",
    "adownB5", "elanB5", "sppelan", "neck_p4", "neck_p3", "neck_down3",
    "neck_p4b", "neck_down4", "neck_p5", "head",
)

_BN_EPS = 1e-3  # ConvBNAct's BatchNorm epsilon


def _load_tensors(path: str) -> Dict[str, np.ndarray]:
    import torch

    try:
        m = torch.jit.load(path, map_location="cpu")
        return {k: v.detach().numpy() for k, v in m.state_dict().items()}
    except Exception:
        from omniparser_tpu.weights.convert_yolo import _load_torch_tensors

        return _load_torch_tensors(path)


def _kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _set(tree: Dict, path: List[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _translate_sub(parts: List[str]) -> List[str]:
    """yolov9-repo sub-module path -> our Flax path (without leaf name)."""
    out: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("cv2", "cv3") and i + 1 < len(parts) and parts[i + 1] in ("0", "1"):
            # RepNCSPELAN4 branch: Sequential(RepNCSP, Conv)
            out.append(f"{p}_csp" if parts[i + 1] == "0" else f"{p}_conv")
            i += 2
            continue
        if p == "m" and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"m{parts[i + 1]}")
            i += 2
            continue
        out.append(p)
        i += 1
    return out


def convert_yolov9_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """yolov9 state dict -> {'params': ..., 'batch_stats': ...}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    unmatched: List[str] = []

    # group by top-level layer index, keep numeric order
    layers: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = re.match(r"(?:model\.)+(\d+)\.(.*)", k)
        if not m:
            unmatched.append(k)
            continue
        layers.setdefault(int(m.group(1)), {})[m.group(2)] = np.asarray(v)
    if len(layers) == len(_MODULE_ORDER):
        order = _MODULE_ORDER
    elif len(layers) == len(_MODULE_ORDER_DUAL):
        order = _MODULE_ORDER_DUAL
    else:
        raise ValueError(
            f"parametric layer count {len(layers)} matches neither the "
            f"single ({len(_MODULE_ORDER)}) nor dual "
            f"({len(_MODULE_ORDER_DUAL)}) GELAN deploy form "
            f"({sorted(layers)})"
        )

    # collect fused RepConvN convs (weight+bias, no bn alongside) so the
    # bias can ride an identity BatchNorm
    for idx, dst in zip(sorted(layers), order):
        sub = layers[idx]
        if dst.startswith("cb"):
            # CBLinear: a plain biased 1x1 conv — the weight+bias-no-bn
            # signature must NOT trigger the fused-RepConvN identity-bn
            # path; _route_leaf routes conv.bias directly
            for key, v in sub.items():
                _route_leaf([dst], key.split("."), v, params, stats,
                            fused=False, unmatched=unmatched,
                            orig=f"model.{idx}.{key}", linear_conv=True)
            continue
        fused_prefixes = {
            k[: -len(".conv.weight")]
            for k in sub
            if k.endswith(".conv.weight")
            and f"{k[: -len('.conv.weight')]}.conv.bias" in sub
            and f"{k[: -len('.conv.weight')]}.bn.weight" not in sub
        }
        for key, v in sub.items():
            parts = key.split(".")
            leaf2 = ".".join(parts[-2:])
            prefix_parts = parts[:-2]
            prefix = ".".join(prefix_parts)
            if dst == "head":
                # DDetect: cv2.{i}.{j} -> box{i}_{j}, cv3.{i}.{j} -> cls{i}_{j}
                if len(parts) >= 3 and parts[0] in ("cv2", "cv3") and parts[1].isdigit():
                    branch = "box" if parts[0] == "cv2" else "cls"
                    name = f"{branch}{parts[1]}_{parts[2]}"
                    rest = parts[3:]
                    our = ["head", name] + _translate_sub(rest[:-2]) if len(rest) > 2 \
                        else ["head", name] + rest[:-2]
                    leaf_parts = rest[-2:] if len(rest) >= 2 else rest
                    _route_leaf(our, leaf_parts, v, params, stats,
                                fused=False, unmatched=unmatched, orig=key)
                    continue
                if parts[0] == "dfl":
                    continue  # analytic in decode_predictions
                unmatched.append(f"model.{idx}.{key}")
                continue
            our = [dst] + _translate_sub(prefix_parts)
            _route_leaf(our, parts[-2:], v, params, stats,
                        fused=prefix in fused_prefixes,
                        unmatched=unmatched, orig=f"model.{idx}.{key}")
        # second pass: fused biases need identity bn stats
        for prefix in fused_prefixes:
            our = [dst] + _translate_sub(prefix.split("."))
            _set(params, our + ["bn", "scale"],
                 np.ones(sub[f"{prefix}.conv.weight"].shape[0], np.float32))
            _set(stats, our + ["bn", "mean"],
                 np.zeros(sub[f"{prefix}.conv.weight"].shape[0], np.float32))
            _set(stats, our + ["bn", "var"],
                 np.full(sub[f"{prefix}.conv.weight"].shape[0], 1.0 - _BN_EPS,
                         np.float32))

    if unmatched:
        raise ValueError(f"unmatched yolov9 keys (refusing partial load): "
                         f"{sorted(unmatched)[:20]}{'...' if len(unmatched) > 20 else ''}")
    return {"params": params, "batch_stats": stats}


def _route_leaf(our: List[str], leaf: List[str], v: np.ndarray,
                params: Dict, stats: Dict, fused: bool,
                unmatched: List[str], orig: str,
                linear_conv: bool = False) -> None:
    leaf_key = ".".join(leaf)
    if leaf_key == "conv.weight":
        if v.ndim == 4:
            _set(params, our + ["conv", "kernel"], _kernel(v))
        else:
            unmatched.append(orig)
    elif leaf_key == "conv.bias" and linear_conv:
        _set(params, our + ["conv", "bias"], v)  # CBLinear biased conv
    elif leaf_key == "conv.bias" and fused:
        _set(params, our + ["bn", "bias"], v)  # identity-bn carries the bias
    elif leaf_key == "bn.weight":
        _set(params, our + ["bn", "scale"], v)
    elif leaf_key == "bn.bias":
        _set(params, our + ["bn", "bias"], v)
    elif leaf_key == "bn.running_mean":
        _set(stats, our + ["bn", "mean"], v)
    elif leaf_key == "bn.running_var":
        _set(stats, our + ["bn", "var"], v)
    elif leaf_key == "bn.num_batches_tracked":
        pass
    elif leaf == ["weight"] and v.ndim == 4:
        # bare head conv (cv*.{i}.2.weight): flax nn.Conv kernel + bias.
        # Only a single-part leaf qualifies — head Sequential convs arrive
        # from the DDetect branch with leaf=["weight"]/["bias"].  A two-part
        # leaf like "bogus.weight" must NOT fall through here (the module
        # contract: every unmatched source key is an ERROR, line 19).
        _set(params, our + ["kernel"], _kernel(v))
    elif leaf == ["bias"]:
        _set(params, our + ["bias"], v)
    else:
        unmatched.append(orig)


def load_yolov9_params(path: str, detector) -> Dict[str, Any]:
    """Load + convert + shape-check against detector.init_params; returns
    a device-resident tree (CLAUDE.md: device_put converter outputs once)."""
    import jax

    sd = _load_tensors(path)
    tree = convert_yolov9_state_dict(sd)
    ref = jax.tree.map(np.asarray, detector.init_params(jax.random.PRNGKey(0)))
    errs: List[Tuple[str, tuple, tuple]] = []

    def walk(r, g, prefix=""):
        if isinstance(r, dict):
            missing = set(r) - set(g if isinstance(g, dict) else {})
            extra = set(g if isinstance(g, dict) else {}) - set(r)
            for k in missing:
                errs.append((f"{prefix}{k}", "missing", None))
            for k in extra:
                errs.append((f"{prefix}{k}", None, "extra"))
            for k in set(r) & set(g):
                walk(r[k], g[k], f"{prefix}{k}/")
        elif tuple(np.shape(r)) != tuple(np.shape(g)):
            errs.append((prefix, tuple(np.shape(r)), tuple(np.shape(g))))

    walk(ref, tree)
    if errs:
        raise ValueError(f"yolov9 conversion mismatches vs "
                         f"{type(detector).__name__}(variant="
                         f"{detector.variant!r}): {errs[:15]}")
    return jax.device_put(tree)
