import numpy as np
import jax.numpy as jnp

from omniparser_tpu.ops.overlap import merge_icons_and_ocr
from tests.conftest import random_boxes
from tests import oracles

N_PAD, M_PAD = 64, 48


def _run_vectorized(icon_boxes, ocr_elems, thr):
    """Run the fixed-shape merge and reassemble the element list like the
    pipeline does, to compare against the reference-semantics oracle."""
    n, m = len(icon_boxes), len(ocr_elems)
    ib = np.zeros((N_PAD, 4), np.float32)
    ib[:n] = icon_boxes
    iv = np.zeros(N_PAD, bool)
    iv[:n] = True
    ob = np.zeros((M_PAD, 4), np.float32)
    ov = np.zeros(M_PAD, bool)
    for k, e in enumerate(ocr_elems):
        ob[k] = e["bbox"]
        ov[k] = True
    res = merge_icons_and_ocr(jnp.asarray(ib), jnp.asarray(iv), jnp.asarray(ob), jnp.asarray(ov), thr)
    icon_keep = np.asarray(res.icon_keep)[:n]
    ocr_keep = np.asarray(res.ocr_keep)[:m]
    absorb = np.asarray(res.absorb)[:n, :m]

    out = [
        dict(e, type="text", interactivity=False, source="box_ocr_content_ocr")
        for k, e in enumerate(ocr_elems)
        if ocr_keep[k]
    ]
    kept = []
    for i in range(n):
        if not icon_keep[i]:
            continue
        labels = "".join(ocr_elems[k]["content"] + " " for k in range(m) if absorb[i, k])
        content = labels if labels else None
        src = "box_yolo_content_ocr" if labels else "box_yolo_content_yolo"
        out.append({"type": "icon", "bbox": list(icon_boxes[i]), "interactivity": True,
                    "content": content, "source": src})
        kept.append((i, content))
    return out, kept


def _canon(elems):
    return [
        (e["type"], tuple(np.round(np.asarray(e["bbox"], np.float64), 6)), e["content"], e["source"])
        for e in elems
    ]


def test_merge_matches_oracle_random(rng):
    for trial in range(10):
        n = int(rng.integers(3, 20))
        m = int(rng.integers(0, 12))
        icons = [list(map(float, b)) for b in random_boxes(rng, n, max_size=0.3)]
        ocr = [
            {"bbox": list(map(float, b)), "content": f"t{k}"}
            for k, b in enumerate(random_boxes(rng, m, max_size=0.15))
        ]
        got, _ = _run_vectorized(np.array(icons, np.float32), ocr, 0.7)
        want, _ = oracles.merge_icons_and_ocr_oracle(icons, ocr, 0.7)
        assert _canon(got) == _canon(want), f"trial {trial}"


def test_ocr_absorbed_into_icon():
    # OCR box fully inside icon: icon gets the text, OCR box removed
    icons = [[0.1, 0.1, 0.5, 0.5]]
    ocr = [{"bbox": [0.2, 0.2, 0.3, 0.3], "content": "Save"}]
    got, kept = _run_vectorized(np.array(icons, np.float32), ocr, 0.7)
    assert len(got) == 1
    assert got[0]["type"] == "icon"
    assert got[0]["content"] == "Save "
    assert got[0]["source"] == "box_yolo_content_ocr"


def test_icon_inside_ocr_dropped():
    icons = [[0.2, 0.2, 0.3, 0.3]]
    ocr = [{"bbox": [0.1, 0.1, 0.5, 0.5], "content": "big text region"}]
    got, kept = _run_vectorized(np.array(icons, np.float32), ocr, 0.7)
    assert len(got) == 1 and got[0]["type"] == "text"
    assert kept == []


def test_bigger_icon_suppressed_by_smaller():
    icons = [[0.1, 0.1, 0.6, 0.6], [0.12, 0.12, 0.5, 0.5]]  # high overlap
    got, kept = _run_vectorized(np.array(icons, np.float32), [], 0.7)
    want, wkept = oracles.merge_icons_and_ocr_oracle(icons, [], 0.7)
    assert [i for i, _ in kept] == [i for i, _ in wkept]
    # only the smaller box survives
    assert [i for i, _ in kept] == [1]


def test_text_donated_twice_when_two_icons_contain_it():
    # the reference appends text before the (failing) remove — both icons
    # get the label, the OCR box is removed once
    icons = [[0.0, 0.0, 0.45, 0.45], [0.05, 0.05, 0.5, 0.5]]
    ocr = [{"bbox": [0.1, 0.1, 0.2, 0.2], "content": "x"}]
    # icons must not suppress each other: overlap ratio vs threshold
    got, kept = _run_vectorized(np.array(icons, np.float32), ocr, 0.99)
    want, wkept = oracles.merge_icons_and_ocr_oracle(icons, ocr, 0.99)
    assert _canon(got) == _canon(want)
    assert [c for _, c in kept] == ["x ", "x "]


def test_stop_scan_at_containing_ocr():
    # OCR k=0 inside icon (donates), OCR k=1 contains icon (stops, drops icon),
    # OCR k=2 inside icon but after the stop: NOT donated, NOT removed
    icons = [[0.1, 0.1, 0.6, 0.6]]
    ocr = [
        {"bbox": [0.15, 0.15, 0.25, 0.25], "content": "a"},
        {"bbox": [0.05, 0.05, 0.7, 0.7], "content": "b"},
        {"bbox": [0.3, 0.3, 0.4, 0.4], "content": "c"},
    ]
    got, kept = _run_vectorized(np.array(icons, np.float32), ocr, 0.7)
    want, wkept = oracles.merge_icons_and_ocr_oracle(icons, ocr, 0.7)
    assert _canon(got) == _canon(want)
    assert kept == []
    contents = [e["content"] for e in got]
    assert contents == ["b", "c"]  # 'a' was absorbed+removed, icon dropped


def test_empty_ocr_list():
    icons = [[0.1, 0.1, 0.3, 0.3], [0.6, 0.6, 0.8, 0.8]]
    got, kept = _run_vectorized(np.array(icons, np.float32), [], 0.7)
    assert len(got) == 2
    assert all(e["content"] is None for e in got)
