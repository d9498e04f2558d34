import numpy as np
import jax
import pytest

from omniparser_tpu.weights.checkpoints import (
    latest_step_dir,
    load_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
                   "b": np.ones(4, np.float32)},
        "stats": {"mean": np.zeros(4, np.float32)},
    }
    p = save_checkpoint(str(tmp_path / "ckpt"), tree)
    restored = load_checkpoint(p, like=tree)
    for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]:
        got = restored
        for k in path:
            got = got[k.key]
        np.testing.assert_array_equal(got, v)


def test_checkpoint_steps_and_latest(tmp_path):
    base = str(tmp_path / "run")
    tree = {"x": np.ones(2, np.float32)}
    save_checkpoint(base, tree, step=1)
    save_checkpoint(base, {"x": np.full(2, 2.0, np.float32)}, step=10)
    save_checkpoint(base, {"x": np.full(2, 3.0, np.float32)}, step=2)
    latest = latest_step_dir(base)
    assert latest.endswith("step_10")
    restored = load_checkpoint(latest, like=tree)
    np.testing.assert_array_equal(restored["x"], np.full(2, 2.0, np.float32))


def test_latest_step_dir_empty(tmp_path):
    assert latest_step_dir(str(tmp_path / "nope")) is None
