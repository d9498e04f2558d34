"""Round-4 synthetic-data generator properties.

The domain-randomized generators (train/synth_gui.py, synth_text.py) are
the models' entire training distribution: these tests pin the properties
the round-4 real-pixels work depends on — font-pool correctness (TeX
cmap bans), glyph-family coverage, theme/layout structural invariants,
and deterministic caching keys.
"""

import numpy as np
import pytest

from omniparser_tpu.train import synth_gui, synth_text


def test_font_pool_and_bans():
    """The pool includes the Segoe-letterform face (cmss10) when
    matplotlib is present, and banned chars re-pick a DejaVu face."""
    files = synth_text._FONT_FILES
    assert len(files) >= 6
    assert any("cmss10" in f for f in files), "single-story-g face missing"
    # cmss10 weighted up: multiple entries
    assert sum("cmss10" in f for f in files) >= 3
    rng = np.random.default_rng(0)
    for _ in range(100):
        f = synth_text.pick_font(rng, "a<b>{c}", 14)
        # the chosen face must not be a banned one for this text
        assert not any(
            path in getattr(f, "path", "") for path in synth_text._FONT_BAN
        )


def test_all_icon_kinds_render_at_all_sizes():
    """Every glyph family draws without degenerate-geometry errors across
    the full size range (outline variants stress small-s arithmetic)."""
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(1)
    for kind in synth_gui.ICON_KINDS:
        for s in (8, 11, 14, 20, 33, 56):
            img = Image.new("RGB", (s + 8, s + 8), (30, 30, 30))
            got = synth_gui._draw_icon(
                ImageDraw.Draw(img), rng, 4, 4, s, (220, 220, 220),
                (30, 30, 30), kind=kind)
            assert got == kind
            # something was drawn (thumbnail pastes noise; all others ink)
            arr = np.asarray(img)
            assert (np.abs(arr.astype(int) - 30) > 40).any(), (kind, s)


def test_captions_cover_all_kinds_and_fit_decoder():
    from omniparser_tpu.train.train_captioner import CAPTIONS, MAX_T

    assert set(CAPTIONS) == set(synth_gui.ICON_KINDS)
    for kind, phrase in CAPTIONS.items():
        assert len(phrase) + 2 <= MAX_T, (kind, phrase)  # bos + eos


def test_scene_structure_and_gt_consistency():
    """Scenes return consistent GT; themed scenes keep boxes in-bounds and
    non-overlapping (the claim grid the detector loss depends on)."""
    rng = np.random.default_rng(7)
    for _ in range(6):
        img, icons, tboxes, texts, kinds = synth_gui.render_gui_scene(
            rng, size=320, return_kinds=True)
        assert img.shape == (320, 320, 3) and img.dtype == np.uint8
        assert len(icons) == len(kinds)
        assert len(tboxes) == len(texts)
        for x1, y1, x2, y2 in icons + tboxes:
            assert 0 <= x1 < x2 <= 320 and 0 <= y1 < y2 <= 320
        # icons never overlap each other (free/claim grid)
        for i, a in enumerate(icons):
            for b in icons[i + 1:]:
                ix = min(a[2], b[2]) - max(a[0], b[0])
                iy = min(a[3], b[3]) - max(a[1], b[1])
                assert ix <= 0 or iy <= 0, (a, b)


def test_generator_determinism_and_version():
    """Same seed -> same scene (training-set reproducibility), and the
    cache version constant exists for the /tmp key."""
    a = synth_gui.render_gui_scene(np.random.default_rng(42), size=128)[0]
    b = synth_gui.render_gui_scene(np.random.default_rng(42), size=128)[0]
    np.testing.assert_array_equal(a, b)
    assert isinstance(synth_gui.DATA_VERSION, int)
    assert synth_gui.DATA_VERSION >= 6


def test_theme_palettes():
    rng = np.random.default_rng(3)
    seen = {"light": 0, "dark": 0, "none": 0}
    for _ in range(200):
        t = synth_gui.sample_theme(rng)
        if t is None:
            seen["none"] += 1
            continue
        seen["dark" if t.dark else "light"] += 1
        base_l = np.mean(t.base)
        text_l = np.mean(t.text)
        # text must contrast the base strongly in every theme
        assert abs(base_l - text_l) > 100
    assert all(v > 10 for v in seen.values()), seen
