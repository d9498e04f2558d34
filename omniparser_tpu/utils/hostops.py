"""ctypes bindings for the native host-ops library (native/hostops.cpp).

Auto-builds libhostops.so on first use when a compiler is present; falls
back to the cv2 implementation otherwise.  The exposed op matches
models/ocr.extract_text_boxes' component semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhostops.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True,
                    capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.extract_components.restype = ctypes.c_int32
            lib.extract_components.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
                ctypes.c_float, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except (OSError, subprocess.SubprocessError):
            _load_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def extract_components(
    prob: np.ndarray, threshold: float, min_area: int, min_score: float,
    max_out: int = 1024,
) -> List[Tuple[Tuple[int, int, int, int], float, int]]:
    """Connected components of (prob > threshold) with per-component
    (bbox xyxy-exclusive, mean prob, area); native if built, else cv2."""
    lib = _load()
    prob = np.ascontiguousarray(prob, np.float32)
    h, w = prob.shape
    if lib is not None:
        boxes = np.zeros((max_out, 4), np.int32)
        scores = np.zeros(max_out, np.float32)
        areas = np.zeros(max_out, np.int32)
        n = lib.extract_components(
            prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h, w, threshold, min_area, min_score, max_out,
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return [
            (tuple(int(v) for v in boxes[i]), float(scores[i]), int(areas[i]))
            for i in range(n)
        ]

    import cv2

    binary = (prob > threshold).astype(np.uint8)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(binary, connectivity=4)
    out = []
    for i in range(1, n):
        x, y, bw, bh, area = stats[i]
        if area < min_area:
            continue
        score = float(prob[labels == i].mean())
        if score < min_score:
            continue
        out.append(((int(x), int(y), int(x + bw), int(y + bh)), score, int(area)))
        if len(out) >= max_out:
            break
    return out
