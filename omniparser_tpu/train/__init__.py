"""Training: detection + caption losses, sharded train step.

The reference never trains (checkpoint load-only, SURVEY.md §5); this
subsystem exists so fine-tuning the icon detector / captioner — the way the
reference's shipped weights were produced upstream — runs TPU-native, and
so the multi-chip dryrun exercises a real dp+tp training graph.
"""

from omniparser_tpu.train.losses import caption_loss, detection_loss
from omniparser_tpu.train.train_step import TrainState, make_train_state, train_step

__all__ = ["detection_loss", "caption_loss", "TrainState", "make_train_state", "train_step"]
