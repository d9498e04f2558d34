"""Batched multi-screenshot parse over a device mesh.

The full multi-chip serving path (the north star's v5e-8 scaling axis):
same-bucket screenshots stack on a dp-sharded batch dim and one jitted
graph runs letterbox+detect+NMS, OCR recognition, overlap merge and
caption-slot compaction; a second (bucketed) dispatch decodes captions.
GSPMD shards the batch over 'dp' (captioner params can additionally shard
over 'tp' — parallel/mesh.shard_params_fsdp_tp).

Slot bucketing (round-2 perf fix): the graph used to decode all B*128
caption slots and recognize all B*256 OCR slots regardless of content,
which made the batched path slower than per-image pipelining on one chip
(PERF.md).  Now
  * OCR slots are trimmed to the largest per-batch candidate count
    (power-of-2 buckets, floor 32), and
  * caption decode is a SEPARATE dispatch over the first Kb slots, where
    Kb is the smallest bucket covering the batch's max caption need —
    compaction packs needed crops first, so slicing [:, :Kb] is lossless.
The split costs one extra device round trip per *batch* (amortized over B
images) and cuts decode work ~4x on typical screens.

Host work stays per-image (connected components, strings, overlay) and is
pipelined around the device dispatches.

Relationship to SOMPipeline.parse_batch: that path pipelines *independent*
per-image graphs — right for mixed bucket sizes on one chip; this path is
one *batched* graph — right for uniform traffic on a mesh.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from omniparser_tpu.ops.boxes import int_box_area
from omniparser_tpu.ops.overlap import merge_icons_and_ocr
from omniparser_tpu.ops.preprocess import (
    crop_lines_batch,
    crop_resize_batch,
    letterbox,
    pad_to_bucket,
)
from omniparser_tpu.pipeline import SOMPipeline

CAP_BUCKETS = (8, 16, 32, 64, 128)


def _bucket(n: int, floor: int, cap: int) -> int:
    b = floor
    while b < n:
        b *= 2
    return min(b, cap)


class ShardedParse:
    """Wraps a SOMPipeline's models into a dp-sharded batched parse.

    Requires the pipeline's OCR backend to be the JAX one (or null) and the
    captioner to be fusable (Florence) or null.
    """

    def __init__(self, pipeline: SOMPipeline, mesh):
        from omniparser_tpu.ocr import NullOCR

        if pipeline._jax_ocr is None and not isinstance(pipeline.ocr, NullOCR):
            raise ValueError(
                "ShardedParse requires the JAX OCR backend (or null); host "
                "OCR backends would silently produce zero text elements here"
            )
        self.p = pipeline
        self.mesh = mesh
        self.dp = mesh.shape["dp"]
        cfg = pipeline.config
        self._rec = pipeline._jax_ocr.rec if pipeline._jax_ocr else None
        self._cap = pipeline.fused.captioner
        batch_sh = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())

        detector = pipeline.detector
        rec = self._rec
        cap = self._cap
        rec_hw = (cfg.ocr.rec_height, cfg.ocr.rec_max_width)
        self.K = K = cfg.captioner.batch_size
        crop_size = cfg.captioner.crop_size
        if cap is not None:
            from omniparser_tpu.models.florence2 import greedy_generate

            prompt_one = np.asarray(cap.prompt_ids, np.int32)
            max_new = cfg.captioner.max_new_tokens

        def one_image(det_vars, rec_vars, padded, hw, true_hw, ocr_boxes, ocr_valid,
                      conf, nms_iou, merge_iou, text_thr):
            """Everything except the caption decode (which batches B*Kb)."""
            # int_box_area gates run at ORIGINAL dims (see pipeline.FusedParseStep)
            h, w = true_hw[0], true_hw[1]
            det_boxes, det_scores, det_valid = detector.detect_graph(
                det_vars, padded, hw, conf, nms_iou, allow_pallas=False
            )
            det_valid = det_valid & (int_box_area(det_boxes, w, h) > 0)
            if rec is not None:
                line_crops = crop_lines_batch(padded, hw, ocr_boxes, rec_hw)
                from omniparser_tpu.models.ocr import ctc_device_stats

                logits = rec.apply(
                    rec_vars, pipeline._jax_ocr.rec_preprocess(line_crops),
                    train=False,
                )
                rec_ids, rec_conf, n_chars = ctc_device_stats(logits)
                ocr_ok = ocr_valid & (n_chars > 0) & (rec_conf > text_thr)
            else:
                m = ocr_boxes.shape[0]
                rec_ids = jnp.zeros((m, 1), jnp.int32)
                ocr_ok = ocr_valid
            ocr_ok = ocr_ok & (int_box_area(ocr_boxes, w, h) > 0)
            res = merge_icons_and_ocr(det_boxes, det_valid, ocr_boxes, ocr_ok,
                                      merge_iou, allow_pallas=False)

            out = {"det_boxes": det_boxes, "det_scores": det_scores,
                   "icon_keep": res.icon_keep, "ocr_keep": res.ocr_keep,
                   "absorb": res.absorb, "ocr_valid": ocr_ok, "rec_ids": rec_ids}
            if cap is not None:
                n = det_boxes.shape[0]
                need = res.icon_keep & ~res.absorb.any(axis=1)
                rank = jnp.cumsum(need) - 1
                dest = jnp.where(need & (rank < K), rank, K)
                cap_boxes = jnp.zeros((K, 4), det_boxes.dtype).at[dest].set(det_boxes, mode="drop")
                out["cap_valid"] = jnp.zeros((K,), jnp.bool_).at[dest].set(need, mode="drop")
                out["cap_src"] = jnp.full((K,), -1, jnp.int32).at[dest].set(
                    jnp.arange(n, dtype=jnp.int32), mode="drop")
                out["crops"] = crop_resize_batch(padded, hw, cap_boxes, crop_size)
            return out

        def stage_a(det_vars, rec_vars, images, hws, true_hws,
                    ocr_boxes, ocr_valid, conf, nms_iou, merge_iou, text_thr):
            return jax.vmap(
                one_image, in_axes=(None, None, 0, 0, 0, 0, 0, None, None, None, None)
            )(det_vars, rec_vars, images, hws, true_hws, ocr_boxes, ocr_valid,
              conf, nms_iou, merge_iou, text_thr)

        self._fn_a = jax.jit(
            stage_a,
            in_shardings=(rep, rep, batch_sh, batch_sh, batch_sh,
                          batch_sh, batch_sh, rep, rep, rep, rep),
        )

        if cap is not None:
            def decode(cap_vars, crops):  # crops [B, Kb, cs, cs, 3]
                b, kb = crops.shape[0], crops.shape[1]
                flat = crops.reshape((b * kb,) + crops.shape[2:])
                prompt = jnp.tile(jnp.asarray(prompt_one)[None], (b * kb, 1))
                tokens = greedy_generate(
                    cap.model, cap_vars, cap.preprocess(flat), prompt, max_new
                )
                return tokens.reshape(b, kb, -1)

            # crops stay dp-sharded through the decode; compiled per Kb
            # bucket.  tp>1 additionally runs the captioner matmuls
            # tensor-parallel (GSPMD inserts the ICI collectives).
            if mesh.shape.get("tp", 1) > 1:
                from omniparser_tpu.parallel.mesh import shard_params_fsdp_tp

                cap_sh = shard_params_fsdp_tp(cap.params, mesh)
            else:
                cap_sh = rep
            self._fn_b = jax.jit(decode, in_shardings=(cap_sh, batch_sh))

    # ------------------------------------------------------------------ #

    def parse_images(self, images: Sequence[np.ndarray]):
        """Same-bucket batched parse.  Returns SOMPipeline result tuples."""
        cfg = self.p.config
        n = len(images)
        b = -(-n // self.dp) * self.dp  # dp-divisible batch

        # shared bucket, ONE stacked host->device upload (no per-image
        # device round trips — _host_pad stays in numpy)
        padded_list = []
        ctxs = []
        for img in images:
            padded, upload, h, w, uh, uw = self.p._host_pad(img)
            padded_list.append(padded)
            ctxs.append({"image": img, "upload_img": upload,
                         "h": h, "w": w, "uh": uh, "uw": uw})
        hb = max(p.shape[0] for p in padded_list)
        wb = max(p.shape[1] for p in padded_list)
        batch = np.zeros((b, hb, wb, 3), np.uint8)
        hws = np.ones((b, 2), np.int32)
        for i, (ctx, padded) in enumerate(zip(ctxs, padded_list)):
            batch[i, : padded.shape[0], : padded.shape[1]] = padded
            hws[i] = (ctx["uh"], ctx["uw"])
        images_dev = jnp.asarray(batch)
        hws_dev = jnp.asarray(hws)
        for i, ctx in enumerate(ctxs):  # _stage_finish needs these
            ctx["padded_dev"] = images_dev[i]
            ctx["orig_hw"] = hws_dev[i]

        # per-image OCR proposals (batched det net, host components)
        max_ocr = cfg.ocr.max_text_boxes
        ocr_arr = np.zeros((b, max_ocr, 4), np.float32)
        ocr_valid = np.zeros((b, max_ocr), bool)
        if self.p._jax_ocr is not None:
            jocr = self.p._jax_ocr
            det_s = cfg.ocr.det_imgsz
            lb = jax.vmap(lambda im, hw: letterbox(im, hw, det_s)[0])(
                images_dev, hws_dev
            )
            probs = np.asarray(jocr._det_q(jocr.det_params, lb))
            for i, ctx in enumerate(ctxs):
                # closed-form letterbox params (host math; no device sync)
                uh, uw = int(hws[i, 0]), int(hws[i, 1])
                r = min(det_s / uh, det_s / uw)
                pads = ((det_s - uh * r) / 2.0, (det_s - uw * r) / 2.0)
                boxes_px = jocr.candidates_from_prob(probs[i], r, pads, uh, uw)
                m = min(len(boxes_px), max_ocr)
                if m:
                    scale = np.array([uw, uh, uw, uh], np.float32)
                    ocr_arr[i, :m] = np.asarray(boxes_px[:m], np.float32) / scale
                    ocr_valid[i, :m] = True
                ctxs[i]["n_ocr"] = m
                ctxs[i]["host_texts"] = None
        else:
            for ctx in ctxs:
                ctx["n_ocr"] = 0
                ctx["host_texts"] = []

        # OCR slot bucket: largest per-batch candidate count, pow-2, >=32 —
        # the recognizer then only processes ~the real line count
        ocr_slots = _bucket(max((c["n_ocr"] for c in ctxs), default=1), 32, max_ocr)
        ocr_arr = ocr_arr[:, :ocr_slots]
        ocr_valid = ocr_valid[:, :ocr_slots]

        cap_vars = self._cap.params if self._cap else 0
        rec_vars = self.p._jax_ocr.rec_params if self.p._jax_ocr else 0
        true_hws = np.ones((b, 2), np.int32)
        for i, ctx in enumerate(ctxs):
            true_hws[i] = (ctx["h"], ctx["w"])
        out_dev = self._fn_a(
            self.p.detector_params, rec_vars, images_dev, hws_dev,
            jnp.asarray(true_hws),
            jnp.asarray(ocr_arr), jnp.asarray(ocr_valid),
            jnp.float32(cfg.detector.box_threshold),
            jnp.float32(cfg.detector.nms_iou_threshold),
            jnp.float32(cfg.iou_threshold), jnp.float32(cfg.ocr.text_threshold),
        )
        crops_dev = out_dev.pop("crops", None)
        out = jax.device_get(out_dev)

        if self._cap is not None:
            # caption bucket: smallest Kb covering the batch's max need;
            # compaction packed needed crops into the first slots
            max_need = int(out["cap_valid"].sum(axis=1).max()) if b else 0
            if max_need > 0:
                kb = _bucket(max_need, CAP_BUCKETS[0], self.K)
                tokens = self._fn_b(cap_vars, crops_dev[:, :kb])
                out["cap_tokens"] = np.asarray(jax.device_get(tokens))

        results = []
        for i, ctx in enumerate(ctxs):
            ctx["ocr_arr"] = ocr_arr[i]
            ctx["out"] = {k: v[i] for k, v in out.items()}
            results.append(self.p._stage_finish(ctx))
        return results


class ShardedServingPipeline:
    """SOMPipeline-compatible facade for the serving layer: batches route
    into ShardedParse over the mesh (SURVEY.md §2.7 'expose mesh/sharding
    config in the serving layer'); single parses are a batch of one."""

    def __init__(self, pipeline: SOMPipeline, mesh):
        self.inner = pipeline
        self.config = pipeline.config
        self.sharded = ShardedParse(pipeline, mesh)
        self.last_timings: Dict[str, float] = {}

    def parse_batch(self, images: Sequence[np.ndarray]):
        return self.sharded.parse_images(images)

    def parse_image(self, image_rgb: np.ndarray, **kw):
        return self.sharded.parse_images([image_rgb])[0]

    def warmup(self, shapes=((1080, 1920),)) -> None:
        """Compile the batched graphs for the common raw buckets."""
        for h, w in shapes:
            blank = np.zeros((h, w, 3), np.uint8)
            self.sharded.parse_images([blank] * self.sharded.dp)
