"""The screenshot -> structured-elements pipeline.

TPU-native rebuild of the reference hot path (util/omniparser.py:16-32 +
util/utils.py:407-486 `get_som_labeled_img`), restructured around ONE fused
jitted device step:

    host:   decode -> pad -> upload (1 host->device transfer)
    device: letterbox -> OCR text-detector -> connected components
            (dispatch #1; output STAYS on device)
    device: [fused] candidate unclip/unmap -> YOLO detect + NMS ->
            OCR line recognizer + CTC stats -> overlap/merge masks ->
            caption-slot compaction -> crop-gather -> Florence greedy
            decode (dispatch #2 -> the parse's ONE download)
    host:   strings, SOM overlay, JSON

The reference makes a host<->device round trip per stage and per caption
batch (SURVEY.md §3.1); on a tunneled TPU each round trip costs tens of
ms, so the two dispatches chain on device with no host sync between them
(OcrConfig.fused_candidates; host OCR backends fall back to a component
download + host unmap between the dispatches).

Element schema and ordering match the reference exactly:
  {'type': 'text'|'icon', 'bbox': [x1,y1,x2,y2] normalized, 'interactivity',
   'content', 'source': 'box_ocr_content_ocr'|'box_yolo_content_ocr'|
   'box_yolo_content_yolo'}
with content-less icons sorted last and captioned in order
(util/utils.py:439-462).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omniparser_tpu.annotate import annotate
from omniparser_tpu.config import PipelineConfig
from omniparser_tpu.models.yolov8 import Detector, default_detector_weights
from omniparser_tpu.ops.boxes import int_box_area
from omniparser_tpu.ops.overlap import merge_icons_and_ocr
from omniparser_tpu.ops.preprocess import (
    crop_lines_batch,
    crop_resize_batch,
    pad_to_bucket,
    pick_bucket_2d,
)
from omniparser_tpu.utils.image import decode_base64_image, encode_image_base64


class NullCaptioner:
    """Placeholder captioner: labels every icon 'icon'.  Stands in for the
    Florence-2 captioner when disabled (schema/ordering identical)."""

    fusable = False

    def caption_crops(self, crops_u8, valid) -> List[str]:
        return ["icon" for _ in range(int(valid.sum()))]


def _make_element(typ, bbox, interactivity, content, source) -> Dict:
    return {
        "type": typ,
        "bbox": [float(v) for v in bbox],
        "interactivity": interactivity,
        "content": content,
        "source": source,
    }


class FusedParseStep:
    """Builds the one-dispatch device graph described in the module docstring.

    Static configuration (rec on/off, caption on/off, slot counts, shapes)
    is baked into the closure; everything else is traced values, so a
    single compiled graph serves all images within a raw bucket.
    """

    def __init__(self, detector: Detector, cfg: PipelineConfig,
                 rec=None, rec_params=None, captioner=None, rec_pre=None,
                 device_candidates: bool = False):
        self.detector = detector
        self.cfg = cfg
        self.rec = rec  # rec params travel per-call (see _stage_dispatch)
        self.rec_pre = rec_pre or (lambda crops: crops / 255.0)
        self.captioner = captioner  # FlorenceCaptioner or None
        self.K = cfg.captioner.batch_size
        # device_candidates: ocr_a/ocr_b args are the det-CC component
        # boxes/count (device futures) and the candidate unclip/unmap runs
        # inside this graph — no host sync before the dispatch
        self.device_candidates = device_candidates
        # split_decode: the fused graph stops at compacted caption crops
        # (kept on device); decode_crops() then runs greedy decode over
        # only the needed slot bucket as a second dispatch
        self.split_decode = bool(captioner is not None
                                 and cfg.captioner.split_decode)
        self._decode_cache: Dict[int, object] = {}
        self._fn = jax.jit(self._build())

    def _build(self):
        cfg = self.cfg
        do_rec = self.rec is not None
        do_cap = self.captioner is not None
        device_candidates = self.device_candidates
        max_ocr = cfg.ocr.max_text_boxes
        detector = self.detector
        rec = self.rec
        rec_pre = self.rec_pre
        rec_hw = (cfg.ocr.rec_height, cfg.ocr.rec_max_width)
        K = self.K
        crop_size = cfg.captioner.crop_size
        if cfg.crop_impl == "mxu":
            from omniparser_tpu.ops.mxu_crop import crop_lines_mxu, crop_resize_mxu

            crop_lines = crop_lines_mxu
            crop_resize = crop_resize_mxu
        else:
            crop_lines = crop_lines_batch
            crop_resize = crop_resize_batch
        split = self.split_decode
        if do_cap:
            from omniparser_tpu.models.florence2 import greedy_generate

            florence = self.captioner.model
            prompt_k = jnp.asarray(
                np.tile(self.captioner.prompt_ids[None], (K, 1)), jnp.int32
            )
            max_new = cfg.captioner.max_new_tokens
            preprocess = self.captioner.preprocess

        def fn(det_vars, rec_vars, cap_vars, padded, hw, true_hw,
               ocr_a, ocr_b, lb_r, lb_pads,
               conf_thr, nms_iou, merge_iou, text_thr):
            # hw: the uploaded (possibly downscaled) frame, drives geometry;
            # true_hw: the ORIGINAL dims — the reference evaluates the
            # int_box_area zero-area gate at original resolution
            # (util/utils.py:401-405), so validity must too even when
            # max_upload_side shrank the upload
            h = true_hw[0]
            w = true_hw[1]
            ocr_overflow = jnp.int32(0)
            if device_candidates:
                # ocr_a/ocr_b: det-CC component boxes [C,4] + count, still
                # on device; unclip + letterbox unmap in-graph
                from omniparser_tpu.ops.components import candidate_boxes_from_cc

                ocr_boxes_norm, ocr_cand_valid, ocr_overflow = (
                    candidate_boxes_from_cc(ocr_a, ocr_b, lb_r, lb_pads, hw,
                                            max_boxes=max_ocr)
                )
            else:
                ocr_boxes_norm, ocr_cand_valid = ocr_a, ocr_b
            det_boxes, det_scores, det_valid, det_overflow = detector.detect_graph(
                det_vars, padded, hw, conf_thr, nms_iou, with_stats=True
            )
            det_valid = det_valid & (int_box_area(det_boxes, w, h) > 0)

            if do_rec:
                from omniparser_tpu.models.ocr import ctc_device_stats

                M = ocr_boxes_norm.shape[0]
                blk = cfg.ocr.rec_block
                if blk and M % blk == 0 and M // blk > 1:
                    # block-looped recognition: trip count = real candidate
                    # count (device scalar), so rec/crop cost scales with
                    # the screenshot's text density instead of the slot cap.
                    # Invalid slots keep all-blank ids (id 0) => n_chars 0.
                    n_valid = jnp.where(
                        ocr_cand_valid,
                        jnp.arange(M, dtype=jnp.int32) + 1, 0
                    ).max()
                    n_blocks = (n_valid + blk - 1) // blk
                    probe = jax.eval_shape(
                        lambda v, c: rec.apply(v, rec_pre(c), train=False),
                        rec_vars,
                        jax.ShapeDtypeStruct((blk, *rec_hw, 3), jnp.float32),
                    )
                    T = probe.shape[1]

                    def rec_body(i, carry):
                        ids_a, conf_a, nch_a = carry
                        s = i * blk
                        boxes_b = jax.lax.dynamic_slice_in_dim(
                            ocr_boxes_norm, s, blk, 0)
                        crops = crop_lines(padded, hw, boxes_b, rec_hw)
                        logits = rec.apply(rec_vars, rec_pre(crops), train=False)
                        ids_b, conf_b, nch_b = ctc_device_stats(logits)
                        return (
                            jax.lax.dynamic_update_slice_in_dim(ids_a, ids_b, s, 0),
                            jax.lax.dynamic_update_slice_in_dim(conf_a, conf_b, s, 0),
                            jax.lax.dynamic_update_slice_in_dim(nch_a, nch_b, s, 0),
                        )

                    rec_ids, rec_conf, n_chars = jax.lax.fori_loop(
                        0, n_blocks, rec_body,
                        (jnp.zeros((M, T), jnp.int32),
                         jnp.zeros((M,), jnp.float32),
                         jnp.zeros((M,), jnp.int32)),
                    )
                else:
                    line_crops = crop_lines(padded, hw, ocr_boxes_norm, rec_hw)
                    logits = rec.apply(rec_vars, rec_pre(line_crops), train=False)
                    rec_ids, rec_conf, n_chars = ctc_device_stats(logits)
                ocr_valid = ocr_cand_valid & (n_chars > 0) & (rec_conf > text_thr)
            else:
                m = ocr_boxes_norm.shape[0]
                rec_ids = jnp.zeros((m, 1), jnp.int32)
                rec_conf = jnp.zeros((m,), jnp.float32)
                ocr_valid = ocr_cand_valid
            ocr_valid = ocr_valid & (int_box_area(ocr_boxes_norm, w, h) > 0)

            res = merge_icons_and_ocr(
                det_boxes, det_valid, ocr_boxes_norm, ocr_valid, merge_iou
            )
            out = {
                "det_boxes": det_boxes,
                "det_scores": det_scores,
                "det_overflow": det_overflow,
                "icon_keep": res.icon_keep,
                "ocr_keep": res.ocr_keep,
                "absorb": res.absorb,
                "ocr_valid": ocr_valid,
                "rec_ids": rec_ids,
                "rec_conf": rec_conf,
            }
            if device_candidates:
                # the host never saw the candidate boxes — ship them in the
                # single download (plus the cap counter: no-silent-caps)
                out["ocr_boxes"] = ocr_boxes_norm
                out["ocr_overflow"] = ocr_overflow

            if do_cap:
                n = det_boxes.shape[0]
                need = res.icon_keep & ~res.absorb.any(axis=1)
                rank = jnp.cumsum(need) - 1
                dest = jnp.where(need & (rank < K), rank, K)
                cap_boxes = jnp.zeros((K, 4), det_boxes.dtype).at[dest].set(
                    det_boxes, mode="drop"
                )
                cap_valid = jnp.zeros((K,), jnp.bool_).at[dest].set(need, mode="drop")
                cap_src = jnp.full((K,), -1, jnp.int32).at[dest].set(
                    jnp.arange(n, dtype=jnp.int32), mode="drop"
                )
                crops = crop_resize(padded, hw, cap_boxes, crop_size)
                out.update(cap_valid=cap_valid, cap_src=cap_src,
                           cap_overflow=need.sum() - cap_valid.sum())
                if split:
                    out["crops"] = crops  # stays on device; decode_crops()
                else:
                    out["cap_tokens"], out["cap_logp"] = greedy_generate(
                        florence, cap_vars, preprocess(crops), prompt_k,
                        max_new, with_scores=True,
                    )
            return out

        return fn

    def decode_crops(self, cap_vars, crops_dev, kb: int):
        """Second dispatch of the split-decode path: greedy-decode the
        first kb caption slots (a power-of-2 bucket covering this image's
        content-less icon count).  One compiled graph per kb."""
        return self._decode_fn(kb)(cap_vars, crops_dev[:kb])

    def _decode_fn(self, kb: int):
        fn = self._decode_cache.get(kb)
        if fn is None:
            from omniparser_tpu.models.florence2 import greedy_generate

            florence = self.captioner.model
            prompt = jnp.asarray(
                np.tile(self.captioner.prompt_ids[None], (kb, 1)), jnp.int32
            )
            max_new = self.cfg.captioner.max_new_tokens
            preprocess = self.captioner.preprocess

            def f(vars_, crops):
                return greedy_generate(
                    florence, vars_, preprocess(crops), prompt, max_new,
                    with_scores=True,
                )

            fn = jax.jit(f)
            self._decode_cache[kb] = fn
        return fn

    def __call__(self, det_vars, rec_vars, cap_vars, padded, hw, true_hw,
                 ocr_a, ocr_b, conf, nms_iou, merge_iou, text_thr,
                 lb_r=0.0, lb_pads=(0.0, 0.0)):
        """ocr_a/ocr_b: (boxes_norm, valid) host arrays, or — with
        device_candidates — the det-CC (boxes, count) device futures plus
        this image's letterbox lb_r/lb_pads."""
        return self._fn(det_vars, rec_vars, cap_vars, padded, hw, true_hw,
                        ocr_a, ocr_b, jnp.float32(lb_r),
                        jnp.asarray(lb_pads, jnp.float32),
                        jnp.float32(conf), jnp.float32(nms_iou),
                        jnp.float32(merge_iou), jnp.float32(text_thr))


class SOMPipeline:
    """End-to-end parse with pluggable detector / captioner / OCR."""

    def __init__(
        self,
        config: PipelineConfig,
        detector: Optional[Detector] = None,
        detector_params=None,
        captioner=None,
        ocr=None,
        rng: Optional[jax.Array] = None,
    ):
        self.config = config
        if detector is None:
            # 'v9e' / 'v9c' select the GELAN family (OmniParser v2.0's
            # default icon_detect_v3 is a YOLOv9-E, util/utils.py:72-81);
            # plain letters stay YOLOv8 (the shipped det_synth family)
            variant = config.detector.variant
            det_cls = Detector
            if variant.startswith("v9"):
                from omniparser_tpu.models.yolov9 import YOLOv9Detector

                det_cls = YOLOv9Detector
                variant = variant[2:] or "e"
            detector = det_cls(
                variant=variant,
                num_classes=config.detector.num_classes,
                imgsz=config.detector.default_imgsz,
                max_det=config.detector.max_detections,
                prefilter=config.detector.prefilter_topk,
            )
        self.detector = detector
        if detector_params is None:
            weights = config.detector_weights
            if weights == "auto":
                weights = default_detector_weights(config.detector)
            if weights and os.path.isdir(weights):
                # shipped/trained orbax checkpoint ({'det': variables};
                # train/train_detector.py on synthetic GUI scenes)
                from omniparser_tpu.weights.checkpoints import load_checkpoint

                like = {"det": jax.tree.map(
                    np.asarray,
                    self.detector.init_params(rng or jax.random.PRNGKey(0)))}
                detector_params = jax.device_put(
                    load_checkpoint(weights, like=like)["det"])
            elif weights:  # ultralytics .pt / torch state_dict export —
                # dispatch on detector family: GELAN checkpoints carry
                # yolov9-repo spellings the v8 converter would reject
                from omniparser_tpu.models.yolov9 import YOLOv9Detector

                if isinstance(self.detector, YOLOv9Detector):
                    from omniparser_tpu.weights.convert_yolov9 import (
                        load_yolov9_params,
                    )

                    detector_params = load_yolov9_params(weights, self.detector)
                else:
                    from omniparser_tpu.weights.convert_yolo import (
                        load_detector_params,
                    )

                    detector_params = load_detector_params(weights, self.detector)
            else:
                detector_params = self.detector.init_params(rng or jax.random.PRNGKey(0))
        self.detector_params = detector_params

        if captioner is None:
            backend = config.captioner.backend
            if not config.use_local_semantics or backend == "null":
                captioner = NullCaptioner()
            elif backend == "blip2":
                from omniparser_tpu.models.blip2 import Blip2Captioner

                captioner = Blip2Captioner(config.captioner)
            elif backend == "phi3v":
                from omniparser_tpu.models.phi3v import Phi3VCaptioner

                captioner = Phi3VCaptioner(config.captioner)
            else:
                from omniparser_tpu.models.florence2 import (
                    FlorenceCaptioner,
                    default_captioner_weights,
                )

                cw = config.captioner_weights
                if cw == "auto":
                    cw = default_captioner_weights()
                if cw and os.path.isfile(os.path.join(cw, "dims.json")):
                    # first-party trained checkpoint (synthetic glyphs)
                    captioner = FlorenceCaptioner.from_synth_checkpoint(
                        cw, config.captioner
                    )
                elif cw:
                    captioner = FlorenceCaptioner.from_checkpoint(
                        cw, config.captioner
                    )
                else:
                    captioner = FlorenceCaptioner(config.captioner)
        self.captioner = captioner

        if ocr is None:
            from omniparser_tpu.ocr import make_ocr_backend

            ocr = make_ocr_backend(config.ocr, weights=config.ocr_weights)
        self.ocr = ocr

        from omniparser_tpu.models.ocr import JaxOCR

        self._jax_ocr = ocr if isinstance(ocr, JaxOCR) else None
        # only KV-cache greedy captioners fuse into the device step; beam
        # decoders (BLIP-2) run as a separate dispatch on the same crops
        florence_cap = captioner if getattr(captioner, "fusable", False) else None
        # device candidates: the det-CC output feeds the fused step without
        # returning to host — parse is dispatch -> dispatch -> one download
        self._fused_ocr = bool(
            self._jax_ocr is not None
            and config.ocr.device_components
            and config.ocr.fused_candidates
        )
        self.fused = FusedParseStep(
            self.detector, config,
            rec=self._jax_ocr.rec if self._jax_ocr else None,
            rec_params=self._jax_ocr.rec_params if self._jax_ocr else None,
            captioner=florence_cap,
            rec_pre=self._jax_ocr.rec_preprocess if self._jax_ocr else None,
            device_candidates=self._fused_ocr,
        )
        self.last_timings: Dict[str, float] = {}

    # ------------------------------------------------------------------ #

    def parse_image(
        self,
        image_rgb: np.ndarray,
        box_threshold: Optional[float] = None,
        iou_threshold: Optional[float] = None,
        som_style: Optional[Dict] = None,
    ) -> Tuple[np.ndarray, Dict[str, List[float]], List[Dict]]:
        """np RGB uint8 -> (annotated RGB, label_coordinates, element list).

        som_style: optional override of the overlay style, with the
        reference's draw_bbox_config keys (text_scale, text_thickness,
        text_padding, thickness) — util/omniparser.py:21-27.
        """
        t: Dict[str, float] = {}
        t0 = time.perf_counter()
        ctx = self._stage_upload(image_rgb)
        ctx["som_style"] = som_style
        t["upload"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        if self._fused_ocr:
            # async det-CC dispatch only; the fused step consumes its
            # device output directly (no component download / host unmap)
            ctx["ocr_fut"] = self._jax_ocr.dispatch_det(
                ctx["padded_dev"], ctx["orig_hw"], hw_host=(ctx["uh"], ctx["uw"])
            )
        else:
            self._stage_ocr(ctx)
        t["ocr_detect"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        self._stage_dispatch(ctx, box_threshold, iou_threshold)
        crops_dev = ctx["out"].pop("crops", None)  # stays on device
        ctx["out"] = jax.device_get(ctx["out"])
        t["device_step"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        self._dispatch_decode(ctx, crops_dev)
        t["decode"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        # host finish (element assembly + SOM overlay) never reads captions,
        # so it runs WHILE the decode dispatch executes on device; the
        # blocking collect below only pays the residual decode time
        result = self._stage_finish(ctx, defer_captions=True)
        t["assemble"] = ctx["t_assemble"]
        t["annotate"] = time.perf_counter() - t0 - ctx["t_assemble"]
        t0 = time.perf_counter()
        self._collect_decode(ctx)
        self._fill_captions(ctx, ctx.pop("_icon_plain", []))
        t["decode"] += time.perf_counter() - t0
        self.last_timings = t
        return result

    def parse_batch(self, images: Sequence[np.ndarray]):
        """Pipelined multi-screenshot parse: all uploads + OCR-det dispatched
        first, fused steps dispatched as prob maps land, downloads last —
        transfers and compute overlap across images (the reference parses
        strictly one request at a time).  Returns a list of parse_image
        tuples."""
        def _start_download(ctx):
            # start the device->host copies early so transfers stream while
            # the device computes later images / the host finishes earlier
            # ones (the finish stage is pure host work on a 1-core box)
            jax.tree.map(
                lambda a: a.copy_to_host_async() if hasattr(a, "copy_to_host_async") else None,
                ctx["out"])

        if self._fused_ocr:
            # fully interleaved software pipeline: each image's uploads
            # block the host at tunnel wire speed, so dispatch image i's
            # det+fused graphs BEFORE uploading image i+1 — the device
            # crunches i while i+1's bytes are still on the wire (measured:
            # the upload phase is the largest and most weather-exposed
            # wall in a batched round)
            ctxs = []
            for img in images:
                ctx = self._stage_upload(img)
                ctx["ocr_fut"] = self._jax_ocr.dispatch_det(
                    ctx["padded_dev"], ctx["orig_hw"], hw_host=(ctx["uh"], ctx["uw"])
                )
                self._stage_dispatch(ctx, None, None)
                ctx["crops_dev"] = ctx["out"].pop("crops", None)
                _start_download(ctx)
                ctxs.append(ctx)
        else:
            # host-candidate OCR blocks on the det prob download inside
            # _stage_ocr: keep the two-phase order (all uploads + det
            # dispatches first) so no det wait serializes with an upload
            ctxs = [self._stage_upload(img) for img in images]
            if self._jax_ocr is not None:
                for ctx in ctxs:  # dispatch all det nets before any download
                    ctx["ocr_fut"] = self._jax_ocr.dispatch_det(
                        ctx["padded_dev"], ctx["orig_hw"], hw_host=(ctx["uh"], ctx["uw"])
                    )
            for ctx in ctxs:
                self._stage_ocr(ctx)
                self._stage_dispatch(ctx, None, None)
                ctx["crops_dev"] = ctx["out"].pop("crops", None)
                _start_download(ctx)
        # drain: download_i blocks until fused_i finishes computing (the
        # device serializes the 8 fused steps — measured, the dominant
        # phase), so run image i's host finish inside image i+1's wait gap
        # instead of idling.  Captions are deferred: after the LAST download
        # every image's slot count is known and ONE batched decode dispatch
        # covers the whole batch (vs 8 serial scans, each behind fused_7 in
        # the FIFO device queue anyway); the finish/overlay work overlaps it.
        decode_handle = None
        last = len(ctxs) - 1
        for i, ctx in enumerate(ctxs):
            ctx["out"] = jax.device_get(ctx["out"])
            if i == last:
                decode_handle = self._dispatch_decode_batch(ctxs)
            ctx["_result"] = self._stage_finish(ctx, defer_captions=True)
        self._collect_decode_batch(decode_handle)
        results = []
        for ctx in ctxs:
            self._fill_captions(ctx, ctx.pop("_icon_plain", []))
            results.append(ctx.pop("_result"))
        return results

    # ----------------------------- stages ----------------------------- #

    def _host_pad(self, image_rgb: np.ndarray):
        """Host half of upload: optional downscale + bucket pad (numpy).
        Returns (padded np array, h, w, uh, uw)."""
        h, w = image_rgb.shape[:2]
        upload = image_rgb
        cap = self.config.max_upload_side
        if cap and max(h, w) > cap:
            # bandwidth-bound deployments: shrink the upload; all bbox
            # coordinates are normalized so geometry is unaffected
            import cv2

            scale = cap / max(h, w)
            upload = cv2.resize(image_rgb, (int(w * scale), int(h * scale)),
                                interpolation=cv2.INTER_AREA)
        uh, uw = upload.shape[:2]
        hb, wb = pick_bucket_2d(uh, uw)
        padded, _ = pad_to_bucket(upload, hb, wb)
        return padded, upload, h, w, uh, uw

    def _stage_upload(self, image_rgb: np.ndarray) -> Dict:
        padded, upload, h, w, uh, uw = self._host_pad(image_rgb)
        return {
            "image": image_rgb, "h": h, "w": w, "uh": uh, "uw": uw,
            # already-downscaled host copy: the SOM canvas resizes from this
            # instead of the full-res original (finish-stage host time)
            "upload_img": upload,
            "padded_dev": jnp.asarray(padded),  # single host->device upload
            "orig_hw": jnp.asarray([uh, uw], jnp.int32),
        }

    def _stage_ocr(self, ctx: Dict) -> None:
        cfg = self.config
        # device-side coords live in the uploaded (possibly downscaled)
        # frame; normalized boxes are frame-independent
        uh, uw = ctx["uh"], ctx["uw"]
        max_ocr = cfg.ocr.max_text_boxes
        ocr_arr = np.zeros((max_ocr, 4), np.float32)
        ocr_cand_valid = np.zeros(max_ocr, bool)
        host_texts: Optional[List[str]] = None
        if self._jax_ocr is not None:
            fut = ctx.pop("ocr_fut", None)
            if fut is None:
                fut = self._jax_ocr.dispatch_det(
                    ctx["padded_dev"], ctx["orig_hw"], hw_host=(ctx["uh"], ctx["uw"])
                )
            prob, r, pads = fut
            boxes_px = self._jax_ocr.candidates_from_prob(prob, r, pads, uh, uw)
            frame_wh = (uw, uh)
        else:
            # host backends see the original image; normalized coords are
            # frame-independent, so divide by the original dims directly
            host_texts, boxes_px = self.ocr.recognize(
                ctx["image"], ctx["padded_dev"], ctx["orig_hw"]
            )
            frame_wh = (ctx["w"], ctx["h"])
        n_ocr = min(len(boxes_px), max_ocr)
        # bucket the OCR slot count so the fused step's recognizer only
        # processes ~the real candidate count (jit compiles per bucket);
        # 0 candidates still need >=1 slot for fixed shapes
        bucket = 32
        while bucket < max(n_ocr, 1):
            bucket *= 2
        bucket = min(bucket, max_ocr)
        ocr_arr = ocr_arr[:bucket]
        ocr_cand_valid = ocr_cand_valid[:bucket]
        if n_ocr:
            fw, fh = frame_wh
            scale = np.array([fw, fh, fw, fh], np.float32)
            ocr_arr[:n_ocr] = np.asarray(boxes_px[:n_ocr], np.float32) / scale
            ocr_cand_valid[:n_ocr] = True
        ctx.update(ocr_arr=ocr_arr, ocr_cand_valid=ocr_cand_valid,
                   n_ocr=n_ocr, host_texts=host_texts)

    def _stage_dispatch(self, ctx: Dict, box_threshold, iou_threshold) -> None:
        cfg = self.config
        box_threshold = cfg.detector.box_threshold if box_threshold is None else box_threshold
        iou_threshold = cfg.iou_threshold if iou_threshold is None else iou_threshold
        cap_vars = self.fused.captioner.params if self.fused.captioner else 0
        rec_vars = self._jax_ocr.rec_params if self._jax_ocr else 0
        if self._fused_ocr:
            fut = ctx.pop("ocr_fut", None)
            if fut is None:
                fut = self._jax_ocr.dispatch_det(
                    ctx["padded_dev"], ctx["orig_hw"],
                    hw_host=(ctx["uh"], ctx["uw"]))
            cc, r, pads = fut
            ocr_a, ocr_b = cc["boxes"], cc["count"]  # device futures
            lb = {"lb_r": r, "lb_pads": pads}
        else:
            ocr_a = jnp.asarray(ctx["ocr_arr"])
            ocr_b = jnp.asarray(ctx["ocr_cand_valid"])
            lb = {}
        ctx["out"] = self.fused(
            self.detector_params, rec_vars, cap_vars, ctx["padded_dev"], ctx["orig_hw"],
            jnp.asarray([ctx["h"], ctx["w"]], jnp.int32),
            ocr_a, ocr_b,
            box_threshold, cfg.detector.nms_iou_threshold,
            iou_threshold, cfg.ocr.text_threshold, **lb,
        )

    def _dispatch_decode(self, ctx: Dict, crops_dev) -> None:
        """Split-decode stage: greedy-decode only the smallest power-of-2
        slot bucket covering this image's content-less icon count (the
        compaction in the fused step packed them first).  Zero need =>
        no dispatch at all."""
        if crops_dev is None or "cap_valid" not in ctx["out"]:
            return
        need = int(np.asarray(ctx["out"]["cap_valid"]).sum())
        if need == 0:
            return
        kb = 8
        while kb < need:
            kb *= 2
        kb = min(kb, self.fused.K)
        ctx["tokens_fut"] = self.fused.decode_crops(
            self.fused.captioner.params, crops_dev, kb
        )

    def _collect_decode(self, ctx: Dict) -> None:
        fut = ctx.pop("tokens_fut", None)
        if fut is not None:
            tok, logp = jax.device_get(fut)
            ctx["out"]["cap_tokens"] = np.asarray(tok)
            ctx["out"]["cap_logp"] = np.asarray(logp)

    # Cross-image batched caption decode (parse_batch only).  Eight serial
    # per-image decode dispatches pay eight scan/dispatch overheads and
    # stream the decoder weights eight times; packing every image's needed
    # slots (compaction puts them at [:need]) into ONE decode over the
    # shared per-kb graphs runs one KV-cache scan for the whole batch.
    _DECODE_CHUNK = 256  # slots per decode dispatch (bounds graph variety)

    def _dispatch_decode_batch(self, ctxs: Sequence[Dict]) -> List:
        needy = []
        for ctx in ctxs:
            crops = ctx.pop("crops_dev", None)
            need = 0
            if crops is not None and "cap_valid" in ctx["out"]:
                need = int(np.asarray(ctx["out"]["cap_valid"]).sum())
            if need:
                needy.append((ctx, crops, need))
        if not needy:
            return []
        parts, offs, off = [], [], 0
        for ctx, crops, need in needy:
            parts.append(crops[:need])
            offs.append((ctx, off, need))
            off += need
        futs, i, pos, remaining = [], 0, 0, off
        while remaining > 0:
            take = min(self._DECODE_CHUNK, remaining)
            seg, got = [], 0
            while got < take:
                use = min(parts[i].shape[0] - pos, take - got)
                seg.append(parts[i][pos:pos + use])
                got += use
                pos += use
                if pos == parts[i].shape[0]:
                    i += 1
                    pos = 0
            kb = 8
            while kb < take:
                kb *= 2
            sel = jnp.concatenate(seg, axis=0) if len(seg) > 1 else seg[0]
            if take < kb:
                sel = jnp.concatenate(
                    [sel, jnp.zeros((kb - take,) + tuple(sel.shape[1:]),
                                    sel.dtype)], axis=0)
            futs.append((self.fused._decode_fn(kb)(
                self.fused.captioner.params, sel), take))
            remaining -= take
        return [futs, offs]

    def _collect_decode_batch(self, handle) -> None:
        if not handle:
            return
        futs, offs = handle
        got = [jax.device_get(f) for f, _ in futs]
        rows = [np.asarray(t)[:n] for (t, _), (_, n) in zip(got, futs)]
        lrows = [np.asarray(l)[:n] for (_, l), (_, n) in zip(got, futs)]
        tokens = rows[0] if len(rows) == 1 else np.concatenate(rows, axis=0)
        logp = lrows[0] if len(lrows) == 1 else np.concatenate(lrows, axis=0)
        for ctx, off, need in offs:
            ctx["out"]["cap_tokens"] = tokens[off:off + need]
            ctx["out"]["cap_logp"] = logp[off:off + need]

    def _fill_captions(self, ctx: Dict, icon_plain) -> None:
        """Fill content-less icon elements with captions: fused tokens for
        the first K slots; overflow via extra batches (reference:
        util/utils.py:79-118 get_parsed_content_icon)."""
        cfg = self.config
        out = ctx["out"]
        det_boxes = out["det_boxes"]
        padded_dev, orig_hw = ctx["padded_dev"], ctx["orig_hw"]
        plain_elems = [e for _, e in icon_plain]
        if plain_elems and "cap_tokens" in out:
            cap = self.fused.captioner
            logps = out.get("cap_logp")
            if logps is None:  # pre-scores graph output (defensive)
                logps = np.zeros(len(out["cap_tokens"]), np.float32)
            by_src = {int(s): (tok, lp) for s, tok, lp, v in
                      zip(out["cap_src"], out["cap_tokens"], logps,
                          out["cap_valid"]) if v}
            missing = []
            for i, e in icon_plain:
                hit = by_src.get(int(i))
                if hit is not None:
                    tok, lp = hit
                    e["content"] = cap.gate_caption(
                        cap.tokens_to_text(tok), float(lp))
                else:
                    missing.append((i, e))
            if missing:  # > K content-less icons: batch the remainder
                boxes_extra = np.stack([det_boxes[i] for i, _ in missing]).astype(np.float32)
                caps = self._caption_boxes(padded_dev, orig_hw, boxes_extra)
                for (_, e), c in zip(missing, caps):
                    e["content"] = c
        elif plain_elems and cfg.use_local_semantics:
            if isinstance(self.captioner, NullCaptioner):
                for e in plain_elems:
                    e["content"] = "icon"
            else:  # non-fusable captioner (BLIP-2 beam decode): batch here
                boxes = np.stack([e["bbox"] for e in plain_elems]).astype(np.float32)
                caps = self._caption_boxes(padded_dev, orig_hw, boxes)
                for e, c in zip(plain_elems, caps):
                    e["content"] = c
        # use_local_semantics=False: icons keep content None (util/utils.py:463-465)

    def _stage_finish(self, ctx: Dict, defer_captions: bool = False):
        cfg = self.config
        t0 = time.perf_counter()
        image_rgb = ctx["image"]
        h, w = ctx["h"], ctx["w"]
        out = ctx["out"]
        if int(out.get("det_overflow", 0)) > 0:
            # no-silent-caps: the static NMS prefilter (2*max_det) dropped
            # above-threshold candidates; raise max_detections to match the
            # reference's unbounded NMS on such screens
            import warnings

            warnings.warn(
                f"detector prefilter overflow: {int(out['det_overflow'])} "
                "above-threshold candidates beyond the top-k window "
                "(raise DetectorConfig.prefilter_topk)", RuntimeWarning,
            )
        if "ocr_boxes" in out:  # device-candidate mode: boxes arrive in `out`
            ocr_arr = out["ocr_boxes"]
            n_ocr = ocr_arr.shape[0]
            host_texts = None
            if int(out.get("ocr_overflow", 0)) > 0:
                import warnings

                warnings.warn(
                    f"OCR candidate overflow: {int(out['ocr_overflow'])} "
                    "text components beyond max_text_boxes slots "
                    "(raise OcrConfig.max_text_boxes)", RuntimeWarning,
                )
        else:
            ocr_arr, n_ocr = ctx["ocr_arr"], ctx["n_ocr"]
            host_texts = ctx["host_texts"]
        padded_dev, orig_hw = ctx["padded_dev"], ctx["orig_hw"]
        if self._jax_ocr is not None:
            texts = {
                k: self._jax_ocr.decode_ids(out["rec_ids"][k])
                for k in range(n_ocr) if out["ocr_valid"][k]
            }
        else:
            texts = {k: (host_texts[k] if host_texts else "") for k in range(n_ocr)}

        elements: List[Dict] = []
        for k in range(n_ocr):
            if out["ocr_keep"][k]:
                elements.append(_make_element(
                    "text", ocr_arr[k], False, texts.get(k, ""), "box_ocr_content_ocr"
                ))
        det_boxes = out["det_boxes"]
        icon_labeled, icon_plain = [], []
        for i in np.nonzero(out["icon_keep"])[0]:
            donors = np.nonzero(out["absorb"][i, :n_ocr])[0]
            if len(donors):
                content = "".join(texts.get(k, "") + " " for k in donors)
                icon_labeled.append(_make_element(
                    "icon", det_boxes[i], True, content, "box_yolo_content_ocr"
                ))
            else:
                icon_plain.append((i, _make_element(
                    "icon", det_boxes[i], True, None, "box_yolo_content_yolo"
                )))
        elements.extend(icon_labeled)
        plain_elems = [e for _, e in icon_plain]
        elements.extend(plain_elems)

        if defer_captions:
            # parse_batch: captions land later via the cross-image batched
            # decode; annotate/label placement below never read `content`,
            # so the overlay can be drawn while the decode still runs
            ctx["_icon_plain"] = icon_plain
        else:
            self._fill_captions(ctx, icon_plain)
        ctx["t_assemble"] = time.perf_counter() - t0

        # --- SOM overlay --- #
        boxes_xyxy = np.array([e["bbox"] for e in elements], np.float32).reshape(-1, 4)
        cxcywh = np.stack(
            [
                (boxes_xyxy[:, 0] + boxes_xyxy[:, 2]) / 2,
                (boxes_xyxy[:, 1] + boxes_xyxy[:, 3]) / 2,
                boxes_xyxy[:, 2] - boxes_xyxy[:, 0],
                boxes_xyxy[:, 3] - boxes_xyxy[:, 1],
            ],
            axis=1,
        )
        canvas = image_rgb
        if cfg.max_som_side and max(h, w) > cfg.max_som_side:
            # serving knob: draw on a downscaled copy (cv2 drawing + PNG
            # encode of 4K frames costs 0.1-0.4 s); coordinates stay in the
            # original frame below, so only overlay pixels are affected.
            # Resize from the already-capped upload copy when it is still
            # at least som-sized — ~2.5x less host resize work at 4K.
            import cv2

            src = image_rgb
            up = ctx.get("upload_img")
            if up is not None and max(up.shape[:2]) >= cfg.max_som_side:
                src = up
            sh, sw = src.shape[:2]
            s = cfg.max_som_side / max(sh, sw)
            if s < 1.0:
                canvas = cv2.resize(src, (int(sw * s), int(sh * s)),
                                    interpolation=cv2.INTER_AREA)
            else:
                # upload copy is already at/below the SOM cap — it IS the
                # canvas (set max_upload_side == max_som_side in serving
                # configs to skip this resize entirely)
                canvas = src
        ch_, cw_ = canvas.shape[:2]
        ratio = max(ch_, cw_) / cfg.som_base_resolution  # util/omniparser.py:21-27
        style = {
            "text_scale": cfg.som_text_scale * ratio,
            "text_thickness": max(int(cfg.som_text_thickness * ratio), 1),
            "text_padding": max(int(cfg.som_text_padding * ratio), 1),
            "thickness": max(int(cfg.som_thickness * ratio), 1),
        }
        if ctx.get("som_style"):
            style.update(ctx["som_style"])
        annotated, _ = annotate(canvas, cxcywh, **style)
        # label_coordinates always refer to the ORIGINAL frame (xywh px),
        # independent of the drawing canvas (util/utils.py:353)
        label_coordinates = {
            str(i): [float(cxcywh[i, 0] - cxcywh[i, 2] / 2) * w,
                     float(cxcywh[i, 1] - cxcywh[i, 3] / 2) * h,
                     float(cxcywh[i, 2]) * w, float(cxcywh[i, 3]) * h]
            for i in range(len(cxcywh))
        }
        if cfg.output_coord_in_ratio:
            label_coordinates = {
                k: [v[0] / w, v[1] / h, v[2] / w, v[3] / h]
                for k, v in label_coordinates.items()
            }
        return annotated, label_coordinates, elements

    def _caption_boxes(self, padded_dev, orig_hw, boxes_norm: np.ndarray) -> List[str]:
        """Caption overflow batches (rare: > batch_size content-less icons)."""
        cfg = self.config.captioner
        bs = cfg.batch_size
        pad_n = -(-len(boxes_norm) // bs) * bs
        arr = np.zeros((pad_n, 4), np.float32)
        arr[: len(boxes_norm)] = boxes_norm
        valid = np.zeros(pad_n, bool)
        valid[: len(boxes_norm)] = True
        out: List[str] = []
        for s in range(0, pad_n, bs):
            crops = crop_resize_batch(
                padded_dev, orig_hw, jnp.asarray(arr[s : s + bs]), cfg.crop_size
            )
            out.extend(self.captioner.caption_crops(crops, valid[s : s + bs]))
        return out

    # ------------------------------------------------------------------ #

    def content_lines(self, elements: Sequence[Dict]) -> List[str]:
        """'Text Box ID i: ...' / 'Icon Box ID j: ...' lines
        (util/utils.py:453-462)."""
        lines = []
        for i, e in enumerate(elements):
            kind = "Text" if e["type"] == "text" else "Icon"
            lines.append(f"{kind} Box ID {i}: {e['content']}")
        return lines

    def flops_per_parse(self, image_rgb: np.ndarray) -> Dict[str, float]:
        """Analytic device FLOPs for this image's compiled graphs, from
        XLA's cost model (AOT lower+compile, cached): the fused parse step
        plus the OCR text-det dispatch.  Basis for the MFU figure in
        bench.py — wall-clock on a tunneled TPU is weather, FLOPs are not."""
        cfg = self.config
        ctx = self._stage_upload(image_rgb)
        cap_vars = self.fused.captioner.params if self.fused.captioner else 0
        rec_vars = self._jax_ocr.rec_params if self._jax_ocr else 0
        if self._fused_ocr:
            cc, r, pads = self._jax_ocr.dispatch_det(
                ctx["padded_dev"], ctx["orig_hw"], hw_host=(ctx["uh"], ctx["uw"]))
            ocr_a, ocr_b = cc["boxes"], cc["count"]
            lb_r, lb_pads = r, pads
        else:
            self._stage_ocr(ctx)
            ocr_a = jnp.asarray(ctx["ocr_arr"])
            ocr_b = jnp.asarray(ctx["ocr_cand_valid"])
            lb_r, lb_pads = 0.0, (0.0, 0.0)
        args = (
            self.detector_params, rec_vars, cap_vars, ctx["padded_dev"],
            ctx["orig_hw"], jnp.asarray([ctx["h"], ctx["w"]], jnp.int32),
            ocr_a, ocr_b, jnp.float32(lb_r), jnp.asarray(lb_pads, jnp.float32),
            jnp.float32(cfg.detector.box_threshold),
            jnp.float32(cfg.detector.nms_iou_threshold),
            jnp.float32(cfg.iou_threshold), jnp.float32(cfg.ocr.text_threshold),
        )
        out = {"fused": _cost_flops(self.fused._fn, *args)}
        if self._jax_ocr is not None:
            s = cfg.ocr.det_imgsz
            out["ocr_det"] = _cost_flops(
                self._jax_ocr._det_fn, self._jax_ocr.det_params,
                jnp.zeros((1, s, s, 3), jnp.float32),
            )
        if self.fused.split_decode:
            # split mode: the fused graph stops at crops; count the decode
            # dispatch at the bucket this image actually needs (plain-icon
            # count from one real parse)
            _, _, elements = self.parse_image(image_rgb)
            need = sum(1 for e in elements
                       if e["source"] == "box_yolo_content_yolo")
            if need:
                kb = 8
                while kb < need:
                    kb *= 2
                kb = min(kb, self.fused.K)
                cs = cfg.captioner.crop_size
                out["decode"] = _cost_flops(
                    self.fused._decode_fn(kb), self.fused.captioner.params,
                    jax.ShapeDtypeStruct((kb, cs, cs, 3), jnp.float32),
                )
        out["total"] = float(sum(out.values()))
        return out

    def warmup(self, shapes: Sequence[Tuple[int, int]] = ((1080, 1920), (2160, 3840)),
               ocr_buckets: Sequence[int] = (32, 64, 128, 256),
               cap_buckets: Sequence[int] = (8, 16, 32, 64, 128)) -> None:
        """Compile the device graphs for the common raw buckets AND (host-
        candidate mode only) every OCR slot bucket — blank warmup images
        yield ~0 candidates, which would otherwise leave the 64/128/256-slot
        fused variants to compile on the first dense-text production
        screenshot.  Device-candidate mode has a single fixed-slot graph
        per raw bucket, so parse_image alone covers it.  Split-decode mode
        additionally compiles the caption-decode graph per slot bucket
        (blank images need 0 captions, so parses alone never compile them)."""
        if self.fused.split_decode:
            cs = self.config.captioner.crop_size
            zeros = jnp.zeros((self.fused.K, cs, cs, 3), jnp.float32)
            for kb in cap_buckets:
                if kb <= self.fused.K:
                    jax.block_until_ready(self.fused.decode_crops(
                        self.fused.captioner.params, zeros, kb))
        for h, w in shapes:
            img = np.zeros((h, w, 3), np.uint8)
            self.parse_image(img)  # compiles ocr-det graph (+ fused graph)
            if self._fused_ocr:
                continue
            ctx = self._stage_upload(img)
            for bucket in ocr_buckets:
                if bucket > self.config.ocr.max_text_boxes:
                    continue
                wctx = dict(
                    ctx,
                    ocr_arr=np.zeros((bucket, 4), np.float32),
                    ocr_cand_valid=np.zeros(bucket, bool),
                    n_ocr=0, host_texts=None,
                )
                self._stage_dispatch(wctx, None, None)
                jax.device_get(wctx["out"])


def _cost_flops(jitted, *args) -> float:
    """XLA cost-analysis flops of a jitted fn at these args (0.0 when the
    backend exposes no cost model)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


class Omniparser:
    """Drop-in facade matching the reference (util/omniparser.py:7-32)."""

    def __init__(self, config: PipelineConfig | dict):
        if isinstance(config, dict):
            # accept the reference's config-dict shape (omniparserserver.py:29-32):
            # som_model_path / caption_model_name / caption_model_path /
            # BOX_TRESHOLD all map onto PipelineConfig
            import dataclasses

            pc = PipelineConfig()
            pc = dataclasses.replace(
                pc,
                detector=dataclasses.replace(
                    pc.detector,
                    box_threshold=config.get("BOX_TRESHOLD", pc.detector.box_threshold),
                ),
                captioner=dataclasses.replace(
                    pc.captioner,
                    backend={"florence2": "florence", "blip2": "blip2"}.get(
                        config.get("caption_model_name", "florence2"),
                        pc.captioner.backend,
                    ),
                ),
                detector_weights=config.get("som_model_path"),
                captioner_weights=config.get("caption_model_path"),
            )
            config = pc
        self.config = config
        self.pipeline = SOMPipeline(config)

    def parse(self, image_base64: str):
        """base64 image -> (SOM image base64, parsed content list)."""
        image = decode_base64_image(image_base64)
        annotated, _, elements = self.pipeline.parse_image(image)
        return encode_image_base64(annotated), elements
