"""On-TPU OCR: DBNet-style text detector + CTC line recognizer.

The reference delegates OCR to EasyOCR (torch CRAFT+CRNN) or PaddleOCR
(C++ DBNet+SVTR) — util/utils.py:20-31, 504-540.  This module is the
TPU-native replacement: both nets are small Flax models compiled by XLA;
only the polygon extraction (connected components) and CTC string decode
run on host.  Weight converters can load trained det/rec weights; with
random init the stage is structurally exercised end-to-end (tests) but
produces no text above threshold.

Architecture notes (ours, not a port):
  * detector: 4-stage conv backbone -> FPN merge at 1/4 scale -> 1-channel
    probability map (DBNet-family semantics: threshold + component boxes);
  * recognizer: conv stack collapsing height, transformer encoder over the
    width axis, CTC head over a 96-char english charset; greedy decode.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, List, Tuple

import cv2
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from omniparser_tpu.config import OcrConfig
from omniparser_tpu.ops.preprocess import crop_lines_batch, letterbox

# charset: CTC blank at index 0
CHARSET = (
    " 0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
)
NUM_CLASSES = len(CHARSET) + 1  # + blank


class _ConvBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


class TextDetector(nn.Module):
    """DBNet-style segmentation net: [B,S,S,3] -> [B,S/2,S/2,1] prob map.

    The map is predicted at 1/2 scale (not DBNet's deep-supervised full
    res): GUI text is 8-30 px tall, and a 1/4-scale map quantizes a 12 px
    line to 3 cells — box IoU tops out ~0.4.  1/2 scale keeps the FPN cost
    at 1/4 and pays one upsampled head conv."""

    width: int = 32
    out_scale: int = 2  # map resolution = input / out_scale
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        w, dt = self.width, self.dtype
        x = x.astype(dt)
        c1 = _ConvBlock(w, 2, dt)(x, train)          # 1/2
        c1 = _ConvBlock(w, 1, dt)(c1, train)
        c2 = _ConvBlock(w * 2, 2, dt)(c1, train)     # 1/4
        c2 = _ConvBlock(w * 2, 1, dt)(c2, train)
        c3 = _ConvBlock(w * 4, 2, dt)(c2, train)     # 1/8
        c3 = _ConvBlock(w * 4, 1, dt)(c3, train)
        c4 = _ConvBlock(w * 8, 2, dt)(c3, train)     # 1/16
        c4 = _ConvBlock(w * 8, 1, dt)(c4, train)

        def up_to(t, ref):
            b, h, wd, c = ref.shape
            return jax.image.resize(t, (t.shape[0], h, wd, t.shape[-1]), "bilinear").astype(dt)

        # FPN merge at 1/4
        p4 = nn.Conv(w * 2, (1, 1), dtype=dt)(c4)
        p3 = nn.Conv(w * 2, (1, 1), dtype=dt)(c3) + up_to(p4, c3)
        p2 = nn.Conv(w * 2, (1, 1), dtype=dt)(c2) + up_to(p3, c2)
        feat = jnp.concatenate([p2, up_to(p3, c2), up_to(p4, c2)], axis=-1)
        feat = _ConvBlock(w * 2, 1, dt)(feat, train)
        # head at 1/2: upsample fused features, one refining conv
        feat = up_to(feat, c1)
        feat = _ConvBlock(w, 1, dt)(feat, train)
        logits = nn.Conv(1, (1, 1), dtype=jnp.float32)(feat)
        return jax.nn.sigmoid(logits)


class TextRecognizer(nn.Module):
    """CTC line recognizer: [B, 32, W, 3] -> [B, W/4, NUM_CLASSES] logits."""

    width: int = 64
    layers: int = 2
    heads: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        w, dt = self.width, self.dtype
        x = x.astype(dt)
        x = _ConvBlock(w, 1, dt)(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))            # 16 x W/2
        x = _ConvBlock(w * 2, 1, dt)(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))            # 8 x W/4
        x = _ConvBlock(w * 4, 1, dt)(x, train)
        x = nn.max_pool(x, (2, 1), strides=(2, 1))            # 4 x W/4
        x = _ConvBlock(w * 4, 1, dt)(x, train)
        x = nn.max_pool(x, (4, 1), strides=(4, 1))            # 1 x W/4
        seq = x.squeeze(1)                                    # [B, T, C]

        # small transformer encoder over the width axis
        d = seq.shape[-1]
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, seq.shape[1], d))
        h = seq + pos.astype(dt)
        for i in range(self.layers):
            a = nn.LayerNorm(dtype=jnp.float32, name=f"ln1_{i}")(h).astype(dt)
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=dt, name=f"attn_{i}"
            )(a, a)
            h = h + a
            m = nn.LayerNorm(dtype=jnp.float32, name=f"ln2_{i}")(h).astype(dt)
            m = nn.Dense(d * 4, dtype=dt, name=f"mlp_in_{i}")(m)
            m = nn.gelu(m)
            m = nn.Dense(d, dtype=dt, name=f"mlp_out_{i}")(m)
            h = h + m
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_f")(h)
        return nn.Dense(NUM_CLASSES, dtype=jnp.float32, name="ctc_head")(h)


def ctc_device_stats(logits: jnp.ndarray):
    """Device-side CTC statistics for a batch: logits [M, T, C] ->
    (argmax ids [M, T] int32, mean char confidence [M], char count [M]).

    Mirrors ctc_greedy_decode's collapse rule (repeats + blanks dropped) so
    the confidence threshold can gate OCR boxes inside the fused graph;
    the string itself is assembled on host from the returned ids.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    ids = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    maxp = jnp.max(probs, axis=-1)
    prev = jnp.concatenate([jnp.full_like(ids[:, :1], -1), ids[:, :-1]], axis=1)
    char_mask = (ids != 0) & (ids != prev)
    n_chars = char_mask.sum(axis=1)
    conf = jnp.where(
        n_chars > 0, (maxp * char_mask).sum(axis=1) / jnp.maximum(n_chars, 1), 0.0
    )
    return ids, conf, n_chars


def ids_to_text(ids_row: np.ndarray, charset: str = CHARSET) -> str:
    """Host: collapse an argmax id row to its CTC string."""
    chars, prev = [], -1
    for i in ids_row:
        if i != prev and i != 0:
            chars.append(charset[i - 1])
        prev = i
    return "".join(chars)


def ctc_greedy_decode(logits: np.ndarray, charset: str = CHARSET) -> Tuple[str, float]:
    """Greedy CTC: argmax per step, collapse repeats, drop blanks.
    Returns (text, mean char prob)."""
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ids = probs.argmax(-1)
    conf = probs.max(-1)
    chars, confs, prev = [], [], -1
    for t, i in enumerate(ids):
        if i != prev and i != 0:
            chars.append(charset[i - 1])
            confs.append(conf[t])
        prev = i
    if not chars:
        return "", 0.0
    return "".join(chars), float(np.mean(confs))


def ctc_beam_decode(logits: np.ndarray, beam_width: int = 10,
                    charset: str = CHARSET) -> Tuple[str, float]:
    """CTC prefix beam search (host): the jax-backend analogue of easyocr's
    `decoder='beamsearch', beamWidth=N` args, which the reference eval path
    requests (eval/ss_pro_gpt4o_omniv2.py:37-51).  Returns (text, conf)
    where conf is the greedy mean-char-prob (the same quantity the
    text_threshold gate is calibrated on)."""
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    T, C = probs.shape
    # prune per step to the top-k symbols — beam search cost is T*k*beam
    k = min(beam_width, C)
    NEG = -1e30

    def logaddexp(a, b):
        if a < b:
            a, b = b, a
        if b <= NEG / 2:
            return a
        return a + np.log1p(np.exp(b - a))

    logp = np.log(np.maximum(probs, 1e-12))
    # beams: prefix tuple -> [log p ending in blank, log p ending in non-blank]
    beams = {(): (0.0, NEG)}
    for t in range(T):
        top = np.argpartition(-logp[t], k - 1)[:k]
        nxt = {}
        for prefix, (pb, pnb) in beams.items():
            for c in top:
                lp = logp[t, c]
                if c == 0:  # blank extends both endings, prefix unchanged
                    b, nb = nxt.get(prefix, (NEG, NEG))
                    nxt[prefix] = (logaddexp(b, logaddexp(pb, pnb) + lp), nb)
                    continue
                new_prefix = prefix + (int(c),)
                if prefix and prefix[-1] == c:
                    # repeat char: extend-from-blank makes a new char,
                    # extend-from-non-blank collapses into the same prefix
                    b, nb = nxt.get(new_prefix, (NEG, NEG))
                    nxt[new_prefix] = (b, logaddexp(nb, pb + lp))
                    b, nb = nxt.get(prefix, (NEG, NEG))
                    nxt[prefix] = (b, logaddexp(nb, pnb + lp))
                else:
                    b, nb = nxt.get(new_prefix, (NEG, NEG))
                    nxt[new_prefix] = (b, logaddexp(nb, logaddexp(pb, pnb) + lp))
        beams = dict(
            sorted(nxt.items(), key=lambda kv: -logaddexp(*kv[1]))[:beam_width]
        )
    best = max(beams.items(), key=lambda kv: logaddexp(*kv[1]))[0]
    _, conf = ctc_greedy_decode(logits, charset)
    return "".join(charset[i - 1] for i in best), conf


def merge_paragraphs(
    texts: List[str], boxes: List[List[int]], y_gap: float = 0.7, x_gap: float = 1.5
) -> Tuple[List[str], List[List[int]]]:
    """easyocr `paragraph=True` semantics for the jax backend: greedily
    union line boxes whose gaps are within (x_gap, y_gap) x line-height,
    then join each group's texts in reading order (top-to-bottom,
    left-to-right) under the union bbox."""
    n = len(boxes)
    if n == 0:
        return texts, boxes
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        x1i, y1i, x2i, y2i = boxes[i]
        hi = max(y2i - y1i, 1)
        for j in range(i + 1, n):
            x1j, y1j, x2j, y2j = boxes[j]
            hj = max(y2j - y1j, 1)
            h = min(hi, hj)
            dx = max(x1i, x1j) - min(x2i, x2j)  # negative when overlapping
            dy = max(y1i, y1j) - min(y2i, y2j)
            if dx < x_gap * h and dy < y_gap * h:
                parent[find(i)] = find(j)
    groups: dict = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    out_texts, out_boxes = [], []
    for members in groups.values():
        members.sort(key=lambda i: (boxes[i][1], boxes[i][0]))
        out_texts.append(" ".join(texts[i] for i in members))
        out_boxes.append([
            min(boxes[i][0] for i in members), min(boxes[i][1] for i in members),
            max(boxes[i][2] for i in members), max(boxes[i][3] for i in members),
        ])
    order = sorted(range(len(out_boxes)), key=lambda g: (out_boxes[g][1], out_boxes[g][0]))
    return [out_texts[g] for g in order], [out_boxes[g] for g in order]


def unclip_component_boxes(
    comps: List[Tuple[Tuple[int, int, int, int], float]],
    unclip: float = 2.0,
    scale: int = 2,
) -> List[Tuple[List[int], float]]:
    """Component boxes at det-map scale -> unclipped boxes in map*scale px.
    The unclip margin inverts the capped shrink used by
    train/synth_text.shrink_map."""
    out = []
    for (x1c, y1c, x2c, y2c), score in comps:
        w, h = x2c - x1c, y2c - y1c
        # unclip: expand box by a perimeter-proportional margin
        margin = (unclip - 1.0) * min(w, h) / 2
        x1 = int(round((x1c - margin) * scale))
        y1 = int(round((y1c - margin) * scale))
        x2 = int(round((x2c + margin) * scale))
        y2 = int(round((y2c + margin) * scale))
        out.append(([x1, y1, x2, y2], score))
    return out


def extract_text_boxes(
    prob_map: np.ndarray,
    bin_threshold: float = 0.3,
    min_score: float = 0.3,
    unclip: float = 2.0,
    min_area: int = 4,
    scale: int = 2,  # TextDetector.out_scale
) -> List[Tuple[List[int], float]]:
    """Probability map (det scale) -> [(x1,y1,x2,y2 in map*scale px, score)].
    DBNet-family postprocess: binarize, connected components (native C++
    hostops when built, cv2 otherwise), expand.  The on-device variant of
    the same postprocess is ops/components.device_components (used when
    OcrConfig.device_components; oracle-matched in tests)."""
    from omniparser_tpu.utils.hostops import extract_components

    comps = [
        (box, score)
        for box, score, _area in extract_components(
            prob_map, bin_threshold, min_area, min_score
        )
    ]
    return unclip_component_boxes(comps, unclip, scale)


def default_ocr_weights(config: OcrConfig):
    """The shipped synthetic-GUI-text checkpoint (trained by
    train/train_ocr.py), when present and geometry-compatible.  The
    reference likewise loads pretrained OCR at import (util/utils.py:20-31);
    'auto' gives every entry point working text reading by default."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "weights", "ocr_en_synth")
    if (os.path.isdir(path) and config.rec_height == 32
            and config.rec_max_width == 480):
        return os.path.abspath(path)
    return None


@dataclasses.dataclass
class JaxOCR:
    """check_ocr_box-compatible backend running both nets under jit."""

    config: OcrConfig
    det_params: Any = None
    rec_params: Any = None

    weights: Any = None  # orbax checkpoint dir {'det': vars, 'rec': vars}

    def __post_init__(self):
        cfg = self.config
        if cfg.arch == "easyocr":
            # the reference's OCR stack (CRAFT + english_g2 VGG-BiLSTM-CTC,
            # util/utils.py:20-22) as Flax modules; loads converted .pth
            from omniparser_tpu.models.ocr_easy import (
                EASYOCR_EN_CHARSET, Craft, VggCtcRecognizer,
            )

            self.det = Craft()
            self.rec = VggCtcRecognizer()
            self.charset = EASYOCR_EN_CHARSET
            if self.det_params is None:
                det_vars = rec_vars = None
                if cfg.easyocr_craft_pth or cfg.easyocr_rec_pth:
                    from omniparser_tpu.weights.convert_ocr import load_easyocr_weights

                    det_vars, rec_vars = load_easyocr_weights(
                        cfg.easyocr_craft_pth, cfg.easyocr_rec_pth
                    )
                k1, k2 = jax.random.split(jax.random.PRNGKey(42))
                # device_put converted trees: host numpy params re-upload
                # through the tunnel on every dispatch otherwise
                self.det_params = (jax.device_put(det_vars) if det_vars
                                   else jax.jit(partial(self.det.init, train=False))(
                                       k1, jnp.zeros((1, 64, 64, 3))))
                self.rec_params = (jax.device_put(rec_vars) if rec_vars
                                   else jax.jit(partial(self.rec.init, train=False))(
                                       k2, jnp.zeros((1, cfg.rec_height, 64, 1))))
        else:
            self.det = TextDetector()
            self.rec = TextRecognizer()
            self.charset = CHARSET
            if self.det_params is None:
                k1, k2 = jax.random.split(jax.random.PRNGKey(42))
                # det params are spatial-size independent -> init small & fast;
                # rec has a width-dependent pos_embed -> init at real rec shape.
                self.det_params = jax.jit(partial(self.det.init, train=False))(
                    k1, jnp.zeros((1, 64, 64, 3))
                )
                self.rec_params = jax.jit(partial(self.rec.init, train=False))(
                    k2, jnp.zeros((1, cfg.rec_height, cfg.rec_max_width, 3))
                )
                if self.weights:
                    # trained nets saved by weights/checkpoints.py (e.g. the
                    # synthetic-GUI-text run in train/train_ocr.py)
                    from omniparser_tpu.weights.checkpoints import load_checkpoint

                    like = {"det": jax.tree.map(np.asarray, self.det_params),
                            "rec": jax.tree.map(np.asarray, self.rec_params)}
                    restored = load_checkpoint(self.weights, like=like)
                    # orbax restores STORED shapes even when `like` differs
                    # (e.g. a checkpoint trained at another rec_max_width) —
                    # fail here with paths, not at apply-time inside the jit
                    from omniparser_tpu.weights.convert_yolo import _check_tree_shapes

                    _check_tree_shapes(like, restored)
                    # device_put ONCE: orbax restores host numpy arrays, and
                    # leaving them on host makes every dispatch re-upload the
                    # whole param tree through the tunnel (~100 ms/call on
                    # axon — measured; this was the #1 latency bug)
                    self.det_params = jax.device_put(restored["det"])
                    self.rec_params = jax.device_put(restored["rec"])
        self._det_fn = jax.jit(partial(self.det.apply, train=False))
        self._rec_fn = jax.jit(partial(self.rec.apply, train=False))
        # quantized prob-map download: [0,1] -> uint8 on device, 4x less
        # tunnel traffic per map (bin/score thresholds are 0.3-coarse).
        # channel 0 is the text/region probability for both arches (native
        # is sigmoid; CRAFT region scores are [0,1] regression — clip).
        self._det_q = jax.jit(
            lambda p, x: (
                jnp.clip(self.det.apply(p, x, train=False)[..., 0], 0.0, 1.0)
                * 255.0 + 0.5
            ).astype(jnp.uint8)
        )
        # letterbox + det in ONE jitted graph: on a tunneled TPU every
        # dispatch costs a round trip (CLAUDE.md), so the latency path
        # makes exactly one det dispatch and downloads one uint8 map
        imgsz = self.config.det_imgsz

        @jax.jit
        def det_full(p, padded, hw):
            img, _r, _pads = letterbox(padded, hw, imgsz)
            return (
                jnp.clip(self.det.apply(p, img[None], train=False)[0, ..., 0],
                         0.0, 1.0) * 255.0 + 0.5
            ).astype(jnp.uint8)

        self._det_full = det_full

        # letterbox + det + connected components in ONE graph: downloads
        # shrink from the ~230 KB prob map to a ~5 KB component list
        # (ops/components.py; OcrConfig.device_components)
        from omniparser_tpu.ops.components import (
            device_components, quantize_u8_parity,
        )

        max_cc = 1024  # hostops.extract_components default max_out

        @jax.jit
        def det_cc_full(p, padded, hw):
            img, _r, _pads = letterbox(padded, hw, imgsz)
            prob = jnp.clip(self.det.apply(p, img[None], train=False)[0, ..., 0],
                            0.0, 1.0)
            # quantize exactly like the uint8 download so both paths
            # binarize/score identically
            return device_components(
                quantize_u8_parity(prob), 0.3, 0.3, min_area=4,
                max_out=max_cc, pre_cap=max_cc,
            )

        self._det_cc_full = det_cc_full

    def rec_preprocess(self, crops_f255):
        """Traceable: [N,H,W,3] float crops in [0,255] -> recognizer input.
        native: RGB/255; easyocr: grayscale, (x-0.5)/0.5 (easyocr recognition
        normalization)."""
        if self.config.arch == "easyocr":
            gray = (crops_f255[..., 0] * 0.299 + crops_f255[..., 1] * 0.587
                    + crops_f255[..., 2] * 0.114)
            return ((gray / 255.0) - 0.5)[..., None] / 0.5
        return crops_f255 / 255.0

    def decode_ids(self, ids_row) -> str:
        """Host: one device-argmax id row -> string (this arch's charset)."""
        return ids_to_text(np.asarray(ids_row), self.charset)

    def dispatch_det(self, padded_dev, orig_hw, hw_host=None):
        """Async: ONE fused letterbox+det(+components) dispatch; returns
        (device future, r, (pad_y, pad_x)) without blocking.  The future
        is the on-device component dict (OcrConfig.device_components,
        default) or the uint8 prob map.  The letterbox params are
        closed-form host math when hw_host=(h, w) is given — fetching
        them as device scalars would cost an extra tunnel round trip."""
        if self.config.device_components:
            fut = self._det_cc_full(self.det_params, padded_dev, orig_hw)
        else:
            fut = self._det_full(self.det_params, padded_dev, orig_hw)
        s = self.config.det_imgsz
        if hw_host is None:
            hw = np.asarray(orig_hw)  # blocks; prefer passing hw_host
            hw_host = (int(hw[0]), int(hw[1]))
        uh, uw = hw_host
        r = min(s / uh, s / uw)
        pads = ((s - uh * r) / 2.0, (s - uw * r) / 2.0)
        return fut, r, pads

    def candidates_from_prob(self, prob_np, r, pads, h: int, w: int):
        """Host half: candidate boxes from the det dispatch output —
        either the on-device component dict (~5 KB download) or a
        downloaded prob map (float in [0,1] or quantized uint8) run
        through host connected components.  The unclip + letterbox unmap
        is ops/components.candidate_boxes_np: shared fp32 math with the
        fully-on-device candidate path (candidate_boxes_from_cc), so both
        produce bit-identical integer boxes."""
        from omniparser_tpu.ops.components import candidate_boxes_np

        cfg = self.config
        if isinstance(prob_np, dict):  # device_components output
            cc = jax.device_get(prob_np)
            n = int(cc["count"])
            comps = [(tuple(int(v) for v in cc["boxes"][i]),
                      float(cc["scores"][i])) for i in range(n)]
        else:
            prob = np.asarray(prob_np)
            if prob.dtype == np.uint8:
                prob = prob.astype(np.float32) / 255.0
            from omniparser_tpu.utils.hostops import extract_components

            comps = [(box, score) for box, score, _area in
                     extract_components(prob, 0.3, 4, 0.3)]
        # cap BEFORE the min-size filter (slot semantics match the device
        # path, which slices the same raster-ordered slots)
        return candidate_boxes_np(comps[: cfg.max_text_boxes], r, pads, w, h)

    def detect_candidates(self, padded_dev, orig_hw, h: int, w: int):
        """Blocking convenience: dispatch + download + components."""
        prob, r, pads = self.dispatch_det(padded_dev, orig_hw, hw_host=(h, w))
        return self.candidates_from_prob(prob, r, pads, h, w)

    def recognize(self, image_rgb, padded_dev=None, orig_hw=None, *,
                  decoder: str = "greedy", beam_width: int = 10,
                  paragraph: bool = False):
        """(texts, boxes).  decoder/beam_width/paragraph mirror easyocr's
        readtext args as used by the reference eval config
        (eval/ss_pro_gpt4o_omniv2.py:37-51); `batch_size` has no analogue —
        all lines are recognized in one device batch already."""
        cfg = self.config
        h, w = image_rgb.shape[:2]
        if padded_dev is None:
            from omniparser_tpu.ops.preprocess import pad_to_bucket, pick_bucket_2d

            hb, wb = pick_bucket_2d(h, w)
            padded, _ = pad_to_bucket(np.asarray(image_rgb), hb, wb)
            padded_dev = jnp.asarray(padded)
            orig_hw = jnp.asarray([h, w], jnp.int32)

        boxes_px = self.detect_candidates(padded_dev, orig_hw, h, w)
        if not boxes_px:
            return [], []

        # 2) recognize: device crop-gather to fixed line shape, CTC decode
        scale = np.array([w, h, w, h], np.float32)
        norm = np.asarray(boxes_px, np.float32) / scale
        # fixed batch: pad to a multiple of 32 lines
        n = len(norm)
        pad_n = -(-n // 32) * 32
        norm_p = np.zeros((pad_n, 4), np.float32)
        norm_p[:n] = norm
        crops = crop_lines_batch(
            padded_dev, orig_hw, jnp.asarray(norm_p), (cfg.rec_height, cfg.rec_max_width)
        )
        logits = np.asarray(self._rec_fn(self.rec_params, self.rec_preprocess(crops)))

        texts, out_boxes = [], []
        decode = (
            (lambda lg: ctc_beam_decode(lg, beam_width, self.charset))
            if decoder == "beamsearch"
            else (lambda lg: ctc_greedy_decode(lg, self.charset))
        )
        for i in range(n):
            text, conf = decode(logits[i])
            if text and conf > cfg.text_threshold:
                texts.append(text)
                out_boxes.append(boxes_px[i])
        if paragraph:
            texts, out_boxes = merge_paragraphs(texts, out_boxes)
        return texts, out_boxes
