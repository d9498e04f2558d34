"""easyocr-compatible OCR architectures in Flax: CRAFT text detection and
the VGG+BiLSTM+CTC recognizer — so *pretrained easyocr weights* can be
converted and served on TPU (weights/convert_ocr.py).

The reference's server OCR is `easyocr.Reader(['en'])` (util/utils.py:20-22),
which runs CRAFT (`craft_mlt_25k.pth`) for detection and the english_g2
VGG-BiLSTM-CTC net for recognition.  These modules restate those PUBLIC
architectures (clovaai/CRAFT-pytorch craft.py; JaidedAI/EasyOCR
model/modules) layer-for-layer so a mechanical state-dict key map converts
the checkpoints; tests/test_convert_ocr.py verifies numeric parity against
torch restatements of the same architectures.

Native-first note: the first-party TPU OCR (models/ocr.py, trained on
synthetic GUI text) stays the default; this exists for weight parity with
the reference's stack (OcrConfig.arch='easyocr').
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# easyocr english charset (number + symbol + en_char order, as in the
# english_g2 recognizer config); CTC blank is index 0 in easyocr
EASYOCR_EN_CHARSET = (
    "0123456789!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~ "
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
)


class _ConvBN(nn.Module):
    """Conv + (optional BN) + optional ReLU, NHWC, eval-mode BN."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    padding: Any = 1
    dilation: int = 1
    use_bn: bool = True
    relu: bool = True
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(
            self.features, self.kernel, padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                             name="bn")(x)
        return nn.relu(x) if self.relu else x


def _maxpool(x, window=(2, 2), strides=None, padding=(0, 0)):
    strides = strides or window
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    return nn.max_pool(x, window, strides=strides, padding=pad)


class CraftVGG(nn.Module):
    """vgg16_bn backbone sliced as CRAFT uses it (basenet/vgg16_bn.py):
    returns (relu2_2, relu3_2, relu4_3, relu5_3, fc7)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        # slice1: convs 1_1,1_2, pool, 2_1, 2_2 (ends at BN of conv2_2)
        x = _ConvBN(64, name="s1c0")(x, train)
        x = _ConvBN(64, name="s1c1")(x, train)
        x = _maxpool(x)
        x = _ConvBN(128, name="s1c2")(x, train)
        x = _ConvBN(128, relu=False, name="s1c3")(x, train)
        relu2_2 = x  # torch slice boundary is pre-ReLU; ReLU opens slice2
        # slice2: relu, pool, 3_1, 3_2 (ends at BN)
        x = nn.relu(x)
        x = _maxpool(x)
        x = _ConvBN(256, name="s2c0")(x, train)
        x = _ConvBN(256, relu=False, name="s2c1")(x, train)
        relu3_2 = x
        # slice3: relu, 3_3, pool, 4_1, 4_2 (ends at BN)
        x = nn.relu(x)
        x = _ConvBN(256, name="s3c0")(x, train)
        x = _maxpool(x)
        x = _ConvBN(512, name="s3c1")(x, train)
        x = _ConvBN(512, relu=False, name="s3c2")(x, train)
        relu4_3 = x
        # slice4: relu, 4_3, pool, 5_1, 5_2 (ends at BN)
        x = nn.relu(x)
        x = _ConvBN(512, name="s4c0")(x, train)
        x = _maxpool(x)
        x = _ConvBN(512, name="s4c1")(x, train)
        x = _ConvBN(512, relu=False, name="s4c2")(x, train)
        relu5_3 = x
        # slice5: pool(3,1,1), dilated fc6, fc7 (no BN/ReLU in torch code)
        x = _maxpool(relu5_3, window=(3, 3), strides=(1, 1), padding=(1, 1))
        x = _ConvBN(1024, kernel=(3, 3), padding=6, dilation=6, use_bn=False,
                    relu=False, name="s5c0")(x, train)
        x = _ConvBN(1024, kernel=(1, 1), padding=0, use_bn=False, relu=False,
                    name="s5c1")(x, train)
        return relu2_2, relu3_2, relu4_3, relu5_3, x


class _DoubleConv(nn.Module):
    """CRAFT double_conv: 1x1 conv (in+mid -> mid) + 3x3 conv (mid -> out),
    both BN+ReLU."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBN(self.mid, kernel=(1, 1), padding=0, name="c0")(x, train)
        x = _ConvBN(self.out, kernel=(3, 3), padding=1, name="c1")(x, train)
        return x


class Craft(nn.Module):
    """CRAFT (clovaai/CRAFT-pytorch craft.py): U-Net over vgg16_bn, output
    [B, H/2, W/2, 2] = (region score, affinity score)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        relu2_2, relu3_2, relu4_3, relu5_3, fc7 = CraftVGG(name="basenet")(x, train)

        def up_to(t, ref):
            return jax.image.resize(
                t, (t.shape[0], ref.shape[1], ref.shape[2], t.shape[3]), "bilinear"
            )

        y = jnp.concatenate([fc7, relu5_3], axis=-1)
        y = _DoubleConv(512, 256, name="upconv1")(y, train)
        y = jnp.concatenate([up_to(y, relu4_3), relu4_3], axis=-1)
        y = _DoubleConv(256, 128, name="upconv2")(y, train)
        y = jnp.concatenate([up_to(y, relu3_2), relu3_2], axis=-1)
        y = _DoubleConv(128, 64, name="upconv3")(y, train)
        y = jnp.concatenate([up_to(y, relu2_2), relu2_2], axis=-1)
        feat = _DoubleConv(64, 32, name="upconv4")(y, train)

        y = _ConvBN(32, use_bn=False, name="cls0")(feat, train)
        y = _ConvBN(32, use_bn=False, name="cls1")(y, train)
        y = _ConvBN(16, use_bn=False, name="cls2")(y, train)
        y = _ConvBN(16, kernel=(1, 1), padding=0, use_bn=False, name="cls3")(y, train)
        y = _ConvBN(2, kernel=(1, 1), padding=0, use_bn=False, relu=False,
                    name="cls4")(y, train)
        return y


class TorchLSTM(nn.Module):
    """Single-layer LSTM with torch's parameter layout (weight_ih [4H, I],
    gate order i,f,g,o) so converted weights drop in without re-packing."""

    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x):  # [B, T, I]
        H = self.hidden
        I = x.shape[-1]
        w_ih = self.param("weight_ih", nn.initializers.lecun_normal(), (4 * H, I))
        w_hh = self.param("weight_hh", nn.initializers.lecun_normal(), (4 * H, H))
        b_ih = self.param("bias_ih", nn.initializers.zeros, (4 * H,))
        b_hh = self.param("bias_hh", nn.initializers.zeros, (4 * H,))

        xs = jnp.flip(x, axis=1) if self.reverse else x
        zx = jnp.einsum("bti,hi->bth", xs, w_ih) + b_ih + b_hh

        def step(carry, zt):
            h, c = carry
            z = zt + h @ w_hh.T
            i, f, g, o = jnp.split(z, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        b = x.shape[0]
        init = (jnp.zeros((b, H), x.dtype), jnp.zeros((b, H), x.dtype))
        _, hs = jax.lax.scan(step, init, jnp.swapaxes(zx, 0, 1))
        hs = jnp.swapaxes(hs, 0, 1)  # [B, T, H]
        return jnp.flip(hs, axis=1) if self.reverse else hs


class BidirectionalLSTM(nn.Module):
    """easyocr modules/sequence_modeling.py BidirectionalLSTM: bi-LSTM +
    output projection."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        fwd = TorchLSTM(self.hidden, name="fwd")(x)
        bwd = TorchLSTM(self.hidden, reverse=True, name="bwd")(x)
        h = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(self.out, name="linear")(h)


class VggCtcRecognizer(nn.Module):
    """easyocr 'generation2' english recognizer: VGG_FeatureExtractor ->
    height-avg pool -> 2x BidirectionalLSTM -> CTC linear head.

    Input [B, H, W, C] grayscale (C=1) floats; output [B, W/4-1, classes]
    raw logits (blank = class 0, easyocr convention)."""

    output_channel: int = 256
    hidden: int = 256
    num_classes: int = len(EASYOCR_EN_CHARSET) + 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.output_channel
        c = [oc // 8, oc // 4, oc // 2, oc]  # 32, 64, 128, 256
        x = _ConvBN(c[0], use_bn=False, name="f0")(x, train)
        x = _maxpool(x)
        x = _ConvBN(c[1], use_bn=False, name="f1")(x, train)
        x = _maxpool(x)
        x = _ConvBN(c[2], use_bn=False, name="f2")(x, train)
        x = _ConvBN(c[2], use_bn=False, name="f3")(x, train)
        x = _maxpool(x, window=(2, 1), strides=(2, 1))
        x = _ConvBN(c[3], use_bias=False, name="f4")(x, train)
        x = _ConvBN(c[3], use_bias=False, name="f5")(x, train)
        x = _maxpool(x, window=(2, 1), strides=(2, 1))
        x = _ConvBN(c[3], kernel=(2, 2), padding=0, use_bn=False, name="f6")(x, train)
        # AdaptiveAvgPool2d((None,1)) over HEIGHT (easyocr permutes W,C,H)
        seq = x.mean(axis=1)  # [B, W', C]
        seq = BidirectionalLSTM(self.hidden, self.hidden, name="rnn0")(seq)
        seq = BidirectionalLSTM(self.hidden, self.hidden, name="rnn1")(seq)
        return nn.Dense(self.num_classes, name="pred")(seq)
