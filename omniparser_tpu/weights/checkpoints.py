"""Checkpoint save/load (orbax) for all model families.

The reference only ever *loads* third-party checkpoints (SURVEY.md §5
"Checkpoint / resume: load-only").  Here save/restore is symmetric so
fine-tuned detectors/captioners/OCR nets round-trip natively, and the
training loop can resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(path: str, tree: Dict[str, Any], step: Optional[int] = None) -> str:
    """Save a pytree (e.g. {'det': vars, 'cap': vars, 'opt': opt_state})."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = os.path.join(path, f"step_{step}") if step is not None else path
    ckptr.save(target, jax.tree.map(np.asarray, tree), force=True)
    ckptr.wait_until_finished()
    return target


def load_checkpoint(path: str, like: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore; `like` (a matching abstract/concrete tree) enables
    shape/dtype-checked restoration."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        # abstract shapes only — never materialize (device trees would copy
        # the full params to host just to read dtypes)
        abstract = jax.eval_shape(lambda t: t, like)
        return ckptr.restore(os.path.abspath(path), abstract)
    return ckptr.restore(os.path.abspath(path))


def latest_step_dir(path: str) -> Optional[str]:
    """Most recent step_N subdir for resume, or None."""
    if not os.path.isdir(path):
        return None
    steps = []
    for d in os.listdir(path):
        if d.startswith("step_") and d.removeprefix("step_").isdigit():
            steps.append(int(d.removeprefix("step_")))
    if not steps:
        return None
    return os.path.join(path, f"step_{max(steps)}")
