"""Configuration dataclasses for the omniparser_tpu pipeline.

Defaults mirror the reference server's hardcoded values
(util/omniparser.py:29-30, omnitool/omniparserserver/omniparserserver.py:16-26):
box_threshold=0.05, iou_threshold=0.7, caption batch 128, EasyOCR-style
text_threshold=0.8.  Unlike the reference (argparse per entry point), one
config object threads through the whole stack.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """YOLOv8-class icon detector settings.

    The reference calls ultralytics with conf=BOX_TRESHOLD and NMS iou=0.1
    (util/utils.py:421, 378-399); imgsz defaults to the raw image size.  We
    run fixed-size letterboxed buckets instead so the jitted graph has
    static shapes.
    """

    variant: str = "n"  # n / s / m  (icon_detect ships a small model)
    num_classes: int = 1
    # static letterbox buckets (longest side); input is letterboxed to
    # (bucket, bucket).  Multiple buckets => multiple compiled graphs.
    # Range mirrors the reference demo's imgsz slider 640-1920
    # (gradio_demo.py:68-76); runtime imgsz snaps to the nearest bucket.
    imgsz_buckets: Tuple[int, ...] = (640, 960, 1280, 1920)
    default_imgsz: int = 1280
    box_threshold: float = 0.05  # reference BOX_TRESHOLD (server default)
    nms_iou_threshold: float = 0.1  # reference get_som_labeled_img iou_threshold=0.1
    max_detections: int = 512  # fixed-shape NMS output slots
    # static top-k window between the confidence filter and NMS.  The
    # reference's NMS sees every above-threshold candidate
    # (util/utils.py:378-399 -> ultralytics, unbounded); a window smaller
    # than the above-threshold count can change the keep-set (the trained
    # checkpoint produces ~2k candidates at conf 0.05 on dense reference
    # screenshots).  4096 covers those with margin; overflow beyond it
    # still warns (no-silent-caps).  Windows > 1024 route NMS to the
    # select-max variant (ops/nms.py) — O(N) memory, max_det steps.
    prefilter_topk: int = 4096
    dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class CaptionerConfig:
    """Florence-2-class captioner settings.

    Reference: crops resized to 64x64 (util/utils.py:92), batch 128
    (util/utils.py:79-80), greedy max_new_tokens=20 (util/utils.py:115).
    """

    model_name: str = "florence2"
    backend: str = "florence"  # 'florence' | 'blip2' | 'phi3v' | 'null'
    crop_size: int = 64
    batch_size: int = 128
    max_new_tokens: int = 20
    prompt: str = "<CAPTION>"
    dtype: str = "bfloat16"
    # 'int8' = weight-only quantized decoder + LM head/embedding table
    # (models/quant.py): -31% resident captioner memory, latency-neutral
    # on the dev chip (see PERF.md); greedy captions gate-tested to match
    # the fp path on the shipped checkpoint.  'none' = fp (reference
    # parity; util/utils.py:61-68 runs fp16/fp32, never quantized).
    quant: str = "none"
    # decode captions in a SECOND device dispatch over only the smallest
    # power-of-2 slot bucket covering this image's content-less icon count
    # (compaction packs needed crops first, so slicing [:kb] is lossless),
    # skipping decode entirely at zero need.  The caption decode is the
    # dominant device cost (Florence-base over all K=128 slots regardless
    # of need); paying one extra device round trip to cut it 4-16x wins
    # even on the tunneled dev chip (PERF.md round 3).  False = the round-2
    # single-dispatch graph (decode fused, all K slots).
    split_decode: bool = True
    # decode-confidence floor: captions whose mean chosen-token log-prob
    # falls below this become the junk phrase 'image icon'.  Real junk
    # detector boxes (chrome fragments) that greedy-decode a glyph phrase
    # do so at visibly lower confidence than true glyphs; emitting them
    # verbatim creates DUPLICATE captions on icon-dense screens (round-5:
    # teams.png had 3x 'send icon'), and any grounder — the scripted one
    # or the reference's GPT-4o reading the element list — must then
    # guess.  None = off (strict reference parity: util/utils.py:79-118
    # keeps every caption) — and the DEFAULT, because measured round-5
    # calibration (label-smoothed retrain, teams.png true-vs-junk logp)
    # showed NO usable separation: junk crops genuinely decode glyph
    # phrases as confidently as true glyphs on this model family.  The
    # machinery stays for models whose confidence does separate.
    min_logp: Optional[float] = None
    # model dims (florence-2-base); overridden by loaded checkpoints
    d_model: int = 768
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 12
    vocab_size: int = 51289


@dataclasses.dataclass(frozen=True)
class OcrConfig:
    """OCR stage settings (reference: util/utils.py:504-540).

    backend: 'jax'   — our DBNet-style detector + CTC recognizer (on-TPU)
             'easyocr'/'paddle' — host libraries if installed (gated import)
             'null'  — no OCR (detection-only parse)
    """

    backend: str = "jax"
    # model family for the jax backend:
    #   'native'  — first-party TextDetector/TextRecognizer (models/ocr.py),
    #               trained on synthetic GUI text (shipped checkpoint)
    #   'easyocr' — CRAFT + VGG-BiLSTM-CTC (models/ocr_easy.py), the
    #               reference's exact OCR stack; loads converted
    #               craft_mlt_25k.pth / english_g2.pth (set rec_height=64)
    arch: str = "native"
    easyocr_craft_pth: Optional[str] = None
    easyocr_rec_pth: Optional[str] = None
    text_threshold: float = 0.8  # server default (util/omniparser.py:29)
    max_text_boxes: int = 256
    # round-4: 960 -> 1920.  Small-text detection dominates real-pixel
    # grounding: real_bench text 48.3% (@960) -> 58.2% (@1280) -> 75.6%
    # (@1920) on the 237-target set; the extra resolution costs ~45 ms
    # device compute (PERF.md round-4 decomposition scales with pixels)
    # against a transport-dominated wall.  The scale-robust det training
    # (upscaled-screen branch) keeps small synthetic frames accurate
    # through the larger letterbox.
    det_imgsz: int = 1920
    rec_height: int = 32
    # 480 px = 15:1 aspect at height 32: full-sentence GUI lines keep ~8 px
    # per char instead of compressing to mush at 320 (crop_lines_batch
    # compresses lines longer than the aspect budget isotropically)
    rec_max_width: int = 480
    dtype: str = "bfloat16"
    # recognize line crops in fixed-size blocks inside a lax.fori_loop whose
    # trip count is the REAL candidate count (data-dependent compute, static
    # shapes): a 20-line screenshot pays for 1 block of 32, not all
    # max_text_boxes slots.  Matters most with fused_candidates, where the
    # host never sees the count and cannot bucket the slot dimension
    # (host-candidate mode buckets slots per dispatch instead).  0 = one
    # full-width rec batch.  Bit-identical on valid slots (tests).
    rec_block: int = 32
    # feed the det components into the fused parse step ON DEVICE
    # (ops/components.candidate_boxes_from_cc): the single-image parse
    # becomes det dispatch -> fused dispatch -> ONE download, with no
    # host sync between them (the component download + host unmap loop
    # was ~30-60 ms of RTT in the tunneled latency path).  Requires
    # device_components; host/compat OCR backends ignore it.
    fused_candidates: bool = True
    # run the DBNet-family connected-components postprocess on device
    # (ops/components.py) and download only per-component boxes (~5 KB)
    # instead of the probability map (~230 KB + tunnel RTT); semantics
    # are oracle-identical (tests/test_components.py)
    device_components: bool = True


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end parse() configuration (reference: util/omniparser.py:16-32)."""

    detector: DetectorConfig = dataclasses.field(default_factory=DetectorConfig)
    captioner: CaptionerConfig = dataclasses.field(default_factory=CaptionerConfig)
    ocr: OcrConfig = dataclasses.field(default_factory=OcrConfig)

    # overlap/merge pass (util/omniparser.py:30: iou_threshold=0.7)
    iou_threshold: float = 0.7
    use_local_semantics: bool = True  # caption icons
    output_coord_in_ratio: bool = True

    # SOM overlay scaling (util/omniparser.py:21-27)
    som_base_resolution: float = 3200.0
    som_text_scale: float = 0.8
    som_text_thickness: int = 2
    som_text_padding: int = 3
    som_thickness: int = 3

    # batching across screenshots (the TPU scaling axis; reference has none)
    max_batch_size: int = 8

    # optional cap on the SOM overlay canvas (longest side, pixels): the
    # overlay is drawn on a downscaled copy and the base64 response shrinks
    # accordingly.  None = draw at native resolution (reference parity).
    # cv2 drawing + PNG encode of 4K frames costs 0.1-0.4 s/request.
    max_som_side: Optional[int] = None

    # optional host downscale cap before upload (longest side, pixels).
    # None = full resolution (reference parity).  Useful when host<->device
    # bandwidth is the bottleneck (e.g. tunneled TPUs): a 3240px screenshot
    # at 2048 cuts the upload ~2.5x; detection runs at <=1280px anyway and
    # only crop/OCR fidelity is affected.
    max_upload_side: Optional[int] = None

    # crop-gather implementation inside the fused step: 'gather' (XLA
    # bilinear gather, default) or 'mxu' (ops/mxu_crop — one-hot
    # interpolation matmuls over a row band; bitwise-identical output).
    # 'mxu' moves the crop FLOPs onto the systolic array and wins where
    # the MXU is not virtualization-capped; on the tunneled dev chip the
    # gather path measured faster (see PERF.md), hence the default.
    crop_impl: str = "gather"

    # weight sources (None => random init, for tests/benches).
    # 'auto' loads the shipped synthetic-GUI-trained checkpoints when
    # present (OCR: models/ocr.default_ocr_weights; detector:
    # weights/det_synth trained by train/train_detector.py; captioner:
    # weights/cap_synth trained by train/train_captioner.py) — the
    # reference likewise loads pretrained weights at init
    # (util/utils.py:20-31,47-75).
    detector_weights: Optional[str] = "auto"
    captioner_weights: Optional[str] = "auto"
    ocr_weights: Optional[str] = "auto"


@dataclasses.dataclass(frozen=True)
class ServerConfig:
    """Serving layer (reference: omnitool/omniparserserver/omniparserserver.py:16-26)."""

    host: str = "0.0.0.0"
    port: int = 8000
    # micro-batching scheduler: collect up to max_batch requests within
    # batch_window_ms before launching one padded device batch.
    batch_window_ms: float = 5.0
    max_batch: int = 8
