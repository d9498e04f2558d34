"""Synthetic grounding benchmark (eval/synth_bench.py): the SS-Pro loop
with a scripted grounder on held-out scenes."""

import os

import numpy as np
import pytest

from omniparser_tpu.eval.synth_bench import ScriptedGrounder, make_dataset

WEIGHTS = [
    os.path.join(os.path.dirname(__file__), "..", "omniparser_tpu", "weights", d)
    for d in ("det_synth", "ocr_en_synth", "cap_synth")
]


def _prompt(instruction, lines):
    screen = "\n".join(lines)
    return (f"In this UI screenshot, I want to perform the command "
            f"'{instruction}'.\n The screen elements are:\n{screen}\n")


def _msg(text):
    return [{"role": "user", "content": [{"type": "text", "text": text}]}]


def test_scripted_grounder_matching():
    g = ScriptedGrounder()
    lines = [
        '<p id=0 class="text" alt="Save As"> </p>',
        '<img id=1 class="icon" alt="settings icon"> </img>',
        '<p id=2 class="text" alt="Cancel"> </p>',
    ]
    r, _ = g(_msg(_prompt("click the text 'Cancel'", lines)))
    assert "Click BBox ID: 2" in r
    r, _ = g(_msg(_prompt("click the settings icon", lines)))
    assert "Click BBox ID: 1" in r
    r, _ = g(_msg(_prompt("click the text 'Nonexistent zz'", lines)))
    assert "Click BBox ID: -" in r


def test_make_dataset_rows():
    rows = make_dataset(2, seed=123)
    assert rows and {"img_path", "instruction", "gt_bbox", "group"} <= set(rows[0])
    groups = {r["group"] for r in rows}
    assert "text" in groups and "icon" in groups
    for r in rows:
        assert all(0.0 <= v <= 1.0 for v in r["gt_bbox"])
        assert isinstance(r["img_path"], np.ndarray)


@pytest.mark.skipif(not all(os.path.isdir(w) for w in WEIGHTS),
                    reason="shipped checkpoints absent")
def test_synth_grounding_accuracy():
    """Full SS-Pro loop on held-out scenes: with all three shipped
    checkpoints the parse must ground a majority of unambiguous
    instructions (the reference pins 39.5% on real SS-Pro with GPT-4o —
    this isolates the parse's contribution with a perfect 'LLM')."""
    from omniparser_tpu.eval.synth_bench import run

    scores = run(n_scenes=2, seed=777555)
    assert scores["n"] >= 10
    assert scores["overall"] >= 0.5, scores
