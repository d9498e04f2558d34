"""Data-parallel batched inference over a device mesh.

The multi-chip serving path (SURVEY.md §2.7): same-bucket screenshots are
stacked on the batch axis and sharded over 'dp'; params are replicated (the
detector is ~3 M params) or tensor-parallel for the captioner.  XLA GSPMD
inserts the ICI collectives; no model-code changes.

On one chip this degenerates to plain batching; the 8-virtual-device CPU
mesh tests exercise the real sharded compilation.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from omniparser_tpu.models.yolov8 import Detector
from omniparser_tpu.ops.preprocess import pad_to_bucket


class ShardedDetector:
    """Batched, dp-sharded detect: [B, Hb, Wb, 3] uint8 -> per-image boxes.

    One compiled graph per (bucket shape, batch size); batch must be a
    multiple of the mesh's dp size (pad with zero images).
    """

    def __init__(self, detector: Detector, mesh):
        self.detector = detector
        self.mesh = mesh
        batch_sh = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())

        def fn(variables, images, hws, conf, iou):
            return jax.vmap(
                lambda img, hw: detector.detect_graph(
                    variables, img, hw, conf, iou, allow_pallas=False  # Mosaic doesn't vmap
                )
            )(images, hws)

        self._fn = jax.jit(
            fn,
            in_shardings=(rep, batch_sh, batch_sh, rep, rep),
            out_shardings=(batch_sh, batch_sh, batch_sh),
        )

    def __call__(self, variables, images_u8: np.ndarray, hws: np.ndarray,
                 conf: float, iou: float):
        """images_u8 [B, Hb, Wb, 3]; hws [B, 2].  B % dp == 0."""
        dp = self.mesh.shape["dp"]
        b = images_u8.shape[0]
        if b % dp:
            raise ValueError(f"batch {b} not a multiple of dp={dp}")
        return self._fn(
            variables, jnp.asarray(images_u8), jnp.asarray(hws, jnp.int32),
            jnp.float32(conf), jnp.float32(iou),
        )

    def detect_images(self, variables, images: Sequence[np.ndarray],
                      conf: float = 0.05, iou: float = 0.1):
        """Convenience: pad a list of raw images into one shared bucket and
        a dp-divisible batch; returns (boxes, scores, valid) for each real
        image."""
        dp = self.mesh.shape["dp"]
        hb = max(-(-im.shape[0] // 512) * 512 for im in images)
        wb = max(-(-im.shape[1] // 512) * 512 for im in images)
        n = len(images)
        b = -(-n // dp) * dp
        batch = np.zeros((b, hb, wb, 3), np.uint8)
        hws = np.ones((b, 2), np.int32)
        for i, im in enumerate(images):
            padded, (h, w) = pad_to_bucket(im, hb, wb)
            batch[i] = padded
            hws[i] = (h, w)
        boxes, scores, valid = self(variables, batch, hws, conf, iou)
        return np.asarray(boxes)[:n], np.asarray(scores)[:n], np.asarray(valid)[:n]


class ShardedCaptioner:
    """dp-sharded + tensor-parallel Florence caption decode over crop batches."""

    def __init__(self, captioner, mesh):
        from omniparser_tpu.models.florence2 import greedy_generate
        from omniparser_tpu.parallel.mesh import shard_params_fsdp_tp

        self.captioner = captioner
        self.mesh = mesh
        batch_sh = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())
        param_sh = {
            "params": shard_params_fsdp_tp(captioner.params["params"], mesh)
        }
        self.sharded_params = jax.device_put(captioner.params, param_sh)
        max_new = captioner.config.max_new_tokens

        self._fn = jax.jit(
            lambda p, px, ids: greedy_generate(captioner.model, p, px, ids, max_new),
            in_shardings=(param_sh, batch_sh, batch_sh),
            out_shardings=batch_sh,
        )

    def caption(self, crops: np.ndarray) -> list:
        """crops [B, S, S, 3] float [0,255], B % dp == 0 -> caption strings."""
        dp = self.mesh.shape["dp"]
        if crops.shape[0] % dp:
            raise ValueError(f"batch {crops.shape[0]} not a multiple of dp={dp}")
        cap = self.captioner
        prompt = jnp.asarray(
            np.tile(cap.prompt_ids[None], (crops.shape[0], 1)), jnp.int32
        )
        tokens = np.asarray(
            self._fn(self.sharded_params, cap.preprocess(jnp.asarray(crops)), prompt)
        )
        return [cap.tokens_to_text(t) for t in tokens]
