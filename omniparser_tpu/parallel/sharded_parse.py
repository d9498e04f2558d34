"""Batched multi-screenshot parse over a device mesh.

The full multi-chip serving path (the north star's v5e-8 scaling axis):
same-bucket screenshots stack on a dp-sharded batch dim and one jitted
graph runs letterbox+detect+NMS, OCR candidate extraction + recognition,
overlap merge and caption-slot compaction; a second (bucketed) dispatch
decodes captions.  GSPMD shards the batch over 'dp' (captioner params can
additionally shard over 'tp' — parallel/mesh.shard_params_fsdp_tp).

Feature parity with the single-chip fused path (VERDICT r3 #3 closed):

  * device candidates — the OCR text-detector's connected components run
    on device (vmapped ops/components.device_components) and unclip/unmap
    inside the batched graph (candidate_boxes_from_cc), so the host never
    loops per image over component lists (the 1-core serving host was the
    old bottleneck) and no host sync sits between the two dispatches;
  * no silent caps — detect runs with_stats=True and the candidate cap
    emits per-image overflow counters; SOMPipeline._stage_finish warns on
    every capped image, exactly like the single-chip route;
  * block-looped recognition — line crops + CTC run in rec_block-sized
    blocks with the trip count derived from the BATCH's real candidate
    count (a device scalar), so rec cost scales with text density instead
    of the slot cap; blocks batch B*blk lines through the recognizer (one
    big MXU matmul instead of B small ones).

Host work stays per-image (strings, overlay) and runs after the download.

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
        # device candidates iff the single-chip path would use them
        self._fused_ocr = bool(pipeline._fused_ocr)
        batch_sh = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())
        self._batch_sh = batch_sh

        detector = pipeline.detector
        rec = self._rec
        cap = self._cap
        rec_pre = pipeline._jax_ocr.rec_preprocess if pipeline._jax_ocr else None
        rec_hw = (cfg.ocr.rec_height, cfg.ocr.rec_max_width)
        max_ocr = cfg.ocr.max_text_boxes
        self.K = K = cfg.captioner.batch_size
        crop_size = cfg.captioner.crop_size
        fused_ocr = self._fused_ocr
        if cap is not None:
            from omniparser_tpu.models.florence2 import greedy_generate

            prompt_one = np.asarray(cap.prompt_ids, np.int32)
            max_new = cfg.captioner.max_new_tokens

        if fused_ocr:
            # batched det-CC dispatch (the vmapped twin of
            # models/ocr.JaxOCR._det_cc_full): letterbox + det net + device
            # connected components, batch dp-sharded
            jocr = pipeline._jax_ocr
            det_mod = jocr.det
            det_imgsz = cfg.ocr.det_imgsz
            from omniparser_tpu.ops.components import (
                device_components,
                quantize_u8_parity,
            )

            def det_cc_one(p, padded, hw):
                img, _r, _pads = letterbox(padded, hw, det_imgsz)
                prob = jnp.clip(
                    det_mod.apply(p, img[None], train=False)[0, ..., 0], 0.0, 1.0
                )
                return device_components(
                    quantize_u8_parity(prob), 0.3, 0.3, min_area=4,
                    max_out=1024, pre_cap=1024,
                )

            self._det_cc_b = jax.jit(
                jax.vmap(det_cc_one, in_axes=(None, 0, 0)),
                in_shardings=(rep, batch_sh, batch_sh),
            )

        def per_image_det(det_vars, padded, hw, true_hw, ocr_a, ocr_b,
                          lb_r, lb_pads, conf, nms_iou):
            """Candidates + detect for ONE image (vmapped below)."""
            if fused_ocr:
                from omniparser_tpu.ops.components import candidate_boxes_from_cc

                ocr_boxes, ocr_cand_valid, ocr_overflow = candidate_boxes_from_cc(
                    ocr_a, ocr_b, lb_r, lb_pads, hw, max_boxes=max_ocr
                )
            else:
                ocr_boxes, ocr_cand_valid = ocr_a, ocr_b
                ocr_overflow = jnp.int32(0)
            det_boxes, det_scores, det_valid, det_overflow = detector.detect_graph(
                det_vars, padded, hw, conf, nms_iou,
                allow_pallas=False, with_stats=True,
            )
            # int_box_area gates run at ORIGINAL dims (see pipeline.FusedParseStep)
            h, w = true_hw[0], true_hw[1]
            det_valid = det_valid & (int_box_area(det_boxes, w, h) > 0)
            return dict(det_boxes=det_boxes, det_scores=det_scores,
                        det_valid=det_valid, det_overflow=det_overflow,
                        ocr_boxes=ocr_boxes, ocr_cand_valid=ocr_cand_valid,
                        ocr_overflow=ocr_overflow)

        def per_image_merge(det_boxes, det_scores, det_valid, ocr_boxes,
                            ocr_ok, rec_ids, true_hw, merge_iou):
            h, w = true_hw[0], true_hw[1]
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
                cap_boxes = jnp.zeros((K, 4), det_boxes.dtype).at[dest].set(
                    det_boxes, mode="drop")
                out["cap_valid"] = jnp.zeros((K,), jnp.bool_).at[dest].set(
                    need, mode="drop")
                out["cap_src"] = jnp.full((K,), -1, jnp.int32).at[dest].set(
                    jnp.arange(n, dtype=jnp.int32), mode="drop")
                out["cap_boxes"] = cap_boxes
            return out

        def stage_a(det_vars, rec_vars, images, hws, true_hws,
                    ocr_a, ocr_b, lb_r, lb_pads,
                    conf, nms_iou, merge_iou, text_thr):
            d = jax.vmap(
                per_image_det,
                in_axes=(None, 0, 0, 0, 0, 0, 0, 0, None, None),
            )(det_vars, images, hws, true_hws, ocr_a, ocr_b, lb_r, lb_pads,
              conf, nms_iou)
            ocr_boxes = d["ocr_boxes"]           # [B, M, 4] normalized
            ocr_cand_valid = d["ocr_cand_valid"]  # [B, M]
            B, M = ocr_boxes.shape[:2]

            if rec is not None:
                from omniparser_tpu.models.ocr import ctc_device_stats

                blk = cfg.ocr.rec_block

                def rec_block(boxes_b):  # [B, blk|M, 4] -> ids/conf/nchars
                    crops = jax.vmap(
                        lambda im, hw_, bx: crop_lines_batch(im, hw_, bx, rec_hw)
                    )(images, hws, boxes_b)
                    nb = boxes_b.shape[1]
                    flat = crops.reshape((B * nb,) + crops.shape[2:])
                    logits = rec.apply(rec_vars, rec_pre(flat), train=False)
                    ids, cf, nch = ctc_device_stats(logits)
                    return (ids.reshape(B, nb, -1), cf.reshape(B, nb),
                            nch.reshape(B, nb))

                if blk and M % blk == 0 and M // blk > 1:
                    # trip count = the BATCH's real candidate count: rec work
                    # scales with text density, not the slot cap; each block
                    # batches B*blk lines through the recognizer
                    n_valid = jnp.where(
                        ocr_cand_valid,
                        jnp.arange(M, dtype=jnp.int32)[None, :] + 1, 0
                    ).max()
                    n_blocks = (n_valid + blk - 1) // blk
                    probe = jax.eval_shape(
                        lambda v, c: rec.apply(v, rec_pre(c), train=False),
                        rec_vars,
                        jax.ShapeDtypeStruct((B * blk, *rec_hw, 3), jnp.float32),
                    )
                    T = probe.shape[1]

                    def body(i, carry):
                        ids_a, conf_a, nch_a = carry
                        s = i * blk
                        boxes_b = jax.lax.dynamic_slice_in_dim(ocr_boxes, s, blk, 1)
                        ids_b, conf_b, nch_b = rec_block(boxes_b)
                        return (
                            jax.lax.dynamic_update_slice_in_dim(ids_a, ids_b, s, 1),
                            jax.lax.dynamic_update_slice_in_dim(conf_a, conf_b, s, 1),
                            jax.lax.dynamic_update_slice_in_dim(nch_a, nch_b, s, 1),
                        )

                    rec_ids, rec_conf, n_chars = jax.lax.fori_loop(
                        0, n_blocks, body,
                        (jnp.zeros((B, M, T), jnp.int32),
                         jnp.zeros((B, M), jnp.float32),
                         jnp.zeros((B, M), jnp.int32)),
                    )
                else:
                    rec_ids, rec_conf, n_chars = rec_block(ocr_boxes)
                ocr_ok = ocr_cand_valid & (n_chars > 0) & (rec_conf > text_thr)
            else:
                rec_ids = jnp.zeros((B, M, 1), jnp.int32)
                ocr_ok = ocr_cand_valid

            out = jax.vmap(
                per_image_merge, in_axes=(0, 0, 0, 0, 0, 0, 0, None)
            )(d["det_boxes"], d["det_scores"], d["det_valid"], ocr_boxes,
              ocr_ok, rec_ids, true_hws, merge_iou)
            out["det_overflow"] = d["det_overflow"]
            if fused_ocr:
                # host never saw the candidates: ship boxes + cap counter
                out["ocr_boxes"] = ocr_boxes
                out["ocr_overflow"] = d["ocr_overflow"]
            if cap is not None:
                cap_boxes = out.pop("cap_boxes")
                out["crops"] = jax.vmap(
                    lambda im, hw_, bx: crop_resize_batch(im, hw_, bx, crop_size)
                )(images, hws, cap_boxes)
            return out

        self._fn_a = jax.jit(
            stage_a,
            in_shardings=(rep, rep, batch_sh, batch_sh, batch_sh,
                          batch_sh, batch_sh, batch_sh, batch_sh,
                          rep, rep, rep, rep),
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

        max_ocr = cfg.ocr.max_text_boxes
        det_s = cfg.ocr.det_imgsz
        if self._fused_ocr:
            # device candidates: batched det-CC dispatch feeds stage_a with
            # component boxes/counts still on device; the letterbox params
            # are closed-form host math (models/ocr.dispatch_det)
            cc = self._det_cc_b(self.p._jax_ocr.det_params, images_dev, hws_dev)
            lb_r = np.zeros((b,), np.float32)
            lb_pads = np.zeros((b, 2), np.float32)
            for i in range(b):
                uh, uw = int(hws[i, 0]), int(hws[i, 1])
                r = min(det_s / uh, det_s / uw)
                lb_r[i] = r
                lb_pads[i] = ((det_s - uh * r) / 2.0, (det_s - uw * r) / 2.0)
            ocr_a, ocr_b = cc["boxes"], cc["count"]
            for ctx in ctxs:
                ctx["host_texts"] = None
        else:
            # host-candidate fallback (device_components/fused off): per-
            # image host CC over the downloaded prob maps, slot-bucketed
            ocr_arr = np.zeros((b, max_ocr, 4), np.float32)
            ocr_valid = np.zeros((b, max_ocr), bool)
            if self.p._jax_ocr is not None:
                jocr = self.p._jax_ocr
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

            # OCR slot bucket: largest per-batch candidate count, pow-2,
            # >=32 — with block-looped rec this only bounds slack, but it
            # still shrinks the merge matrices
            ocr_slots = _bucket(
                max((c.get("n_ocr", 0) for c in ctxs), default=1), 32, max_ocr)
            ocr_arr = ocr_arr[:, :ocr_slots]
            ocr_valid = ocr_valid[:, :ocr_slots]
            ocr_a = jnp.asarray(ocr_arr)
            ocr_b = jnp.asarray(ocr_valid)
            lb_r = np.zeros((b,), np.float32)
            lb_pads = np.zeros((b, 2), np.float32)
            for i, ctx in enumerate(ctxs):
                ctx["ocr_arr"] = ocr_arr[i]

        cap_vars = self._cap.params if self._cap else 0
        rec_vars = self.p._jax_ocr.rec_params if self.p._jax_ocr else 0
        true_hws = np.ones((b, 2), np.int32)
        for i, ctx in enumerate(ctxs):
            true_hws[i] = (ctx["h"], ctx["w"])
        out_dev = self._fn_a(
            self.p.detector_params, rec_vars, images_dev, hws_dev,
            jnp.asarray(true_hws), ocr_a, ocr_b,
            jnp.asarray(lb_r), jnp.asarray(lb_pads),
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
