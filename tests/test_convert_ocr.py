"""Numeric parity for the easyocr-architecture converters.

Builds torch restatements of the PUBLIC CRAFT / english_g2 architectures
(the exact module layout easyocr checkpoints serialize), random-inits them,
converts their state dicts via weights/convert_ocr.py, and requires the
Flax modules to reproduce the torch forward outputs.  This proves the key
map + transposes + arch restatement end to end — loading a real
craft_mlt_25k.pth / english_g2.pth is then a pure IO step.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from omniparser_tpu.models.ocr_easy import Craft, VggCtcRecognizer  # noqa: E402
from omniparser_tpu.weights.convert_ocr import (  # noqa: E402
    convert_craft_state_dict,
    convert_easyocr_rec_state_dict,
)


def _vgg16_bn_features():
    feats, in_ch = [], 3
    for v in [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512]:
        if v == "M":
            feats.append(tnn.MaxPool2d(2, 2))
        else:
            feats += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.BatchNorm2d(v),
                      tnn.ReLU(inplace=True)]
            in_ch = v
    return feats


class _TorchVGGSlices(tnn.Module):
    """clovaai/CRAFT-pytorch basenet/vgg16_bn.py layout (global indices
    preserved as child names — that is what the checkpoint keys encode)."""

    def __init__(self):
        super().__init__()
        feats = _vgg16_bn_features()
        for name, rng in [("slice1", range(12)), ("slice2", range(12, 19)),
                          ("slice3", range(19, 29)), ("slice4", range(29, 39))]:
            seq = tnn.Sequential()
            for x in rng:
                seq.add_module(str(x), feats[x])
            setattr(self, name, seq)
        self.slice5 = tnn.Sequential(
            tnn.MaxPool2d(3, 1, 1),
            tnn.Conv2d(512, 1024, 3, padding=6, dilation=6),
            tnn.Conv2d(1024, 1024, 1),
        )

    def forward(self, x):
        h = self.slice1(x)
        relu2_2 = h
        h = self.slice2(h)
        relu3_2 = h
        h = self.slice3(h)
        relu4_3 = h
        h = self.slice4(h)
        relu5_3 = h
        fc7 = self.slice5(h)
        return relu2_2, relu3_2, relu4_3, relu5_3, fc7


def _double_conv(in_ch, mid_ch, out_ch):
    m = tnn.Module()
    m.conv = tnn.Sequential(
        tnn.Conv2d(in_ch + mid_ch, mid_ch, 1), tnn.BatchNorm2d(mid_ch),
        tnn.ReLU(inplace=True),
        tnn.Conv2d(mid_ch, out_ch, 3, padding=1), tnn.BatchNorm2d(out_ch),
        tnn.ReLU(inplace=True),
    )
    m.forward = m.conv.forward
    return m


class _TorchCraft(tnn.Module):
    def __init__(self):
        super().__init__()
        self.basenet = _TorchVGGSlices()
        self.upconv1 = _double_conv(1024, 512, 256)
        self.upconv2 = _double_conv(512, 256, 128)
        self.upconv3 = _double_conv(256, 128, 64)
        self.upconv4 = _double_conv(128, 64, 32)
        self.conv_cls = tnn.Sequential(
            tnn.Conv2d(32, 32, 3, padding=1), tnn.ReLU(inplace=True),
            tnn.Conv2d(32, 32, 3, padding=1), tnn.ReLU(inplace=True),
            tnn.Conv2d(32, 16, 3, padding=1), tnn.ReLU(inplace=True),
            tnn.Conv2d(16, 16, 1), tnn.ReLU(inplace=True),
            tnn.Conv2d(16, 2, 1),
        )

    def forward(self, x):
        relu2_2, relu3_2, relu4_3, relu5_3, fc7 = self.basenet(x)
        y = torch.cat([fc7, relu5_3], dim=1)
        y = self.upconv1(y)
        y = F.interpolate(y, size=relu4_3.size()[2:], mode="bilinear",
                          align_corners=False)
        y = self.upconv2(torch.cat([y, relu4_3], dim=1))
        y = F.interpolate(y, size=relu3_2.size()[2:], mode="bilinear",
                          align_corners=False)
        y = self.upconv3(torch.cat([y, relu3_2], dim=1))
        y = F.interpolate(y, size=relu2_2.size()[2:], mode="bilinear",
                          align_corners=False)
        feat = self.upconv4(torch.cat([y, relu2_2], dim=1))
        return self.conv_cls(feat).permute(0, 2, 3, 1)


class _TorchBiLSTM(tnn.Module):
    def __init__(self, input_size, hidden_size, output_size):
        super().__init__()
        self.rnn = tnn.LSTM(input_size, hidden_size, bidirectional=True,
                            batch_first=True)
        self.linear = tnn.Linear(hidden_size * 2, output_size)

    def forward(self, x):
        r, _ = self.rnn(x)
        return self.linear(r)


class _TorchRec(tnn.Module):
    """easyocr model/vgg_model.py generation2 Model layout."""

    def __init__(self, num_classes, oc=256, hidden=256):
        super().__init__()
        c = [oc // 8, oc // 4, oc // 2, oc]
        fe = tnn.Module()
        fe.ConvNet = tnn.Sequential(
            tnn.Conv2d(1, c[0], 3, 1, 1), tnn.ReLU(inplace=True),
            tnn.MaxPool2d(2, 2),
            tnn.Conv2d(c[0], c[1], 3, 1, 1), tnn.ReLU(inplace=True),
            tnn.MaxPool2d(2, 2),
            tnn.Conv2d(c[1], c[2], 3, 1, 1), tnn.ReLU(inplace=True),
            tnn.Conv2d(c[2], c[2], 3, 1, 1), tnn.ReLU(inplace=True),
            tnn.MaxPool2d((2, 1), (2, 1)),
            tnn.Conv2d(c[2], c[3], 3, 1, 1, bias=False), tnn.BatchNorm2d(c[3]),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(c[3], c[3], 3, 1, 1, bias=False), tnn.BatchNorm2d(c[3]),
            tnn.ReLU(inplace=True),
            tnn.MaxPool2d((2, 1), (2, 1)),
            tnn.Conv2d(c[3], c[3], 2, 1, 0), tnn.ReLU(inplace=True),
        )
        self.FeatureExtraction = fe
        self.AdaptiveAvgPool = tnn.AdaptiveAvgPool2d((None, 1))
        self.SequenceModeling = tnn.Sequential(
            _TorchBiLSTM(oc, hidden, hidden), _TorchBiLSTM(hidden, hidden, hidden)
        )
        self.Prediction = tnn.Linear(hidden, num_classes)

    def forward(self, x):
        v = self.FeatureExtraction.ConvNet(x)
        v = self.AdaptiveAvgPool(v.permute(0, 3, 1, 2)).squeeze(3)
        return self.Prediction(self.SequenceModeling(v))


def test_craft_converter_numeric_parity(rng):
    torch.manual_seed(0)
    model = _TorchCraft().eval()
    # non-default BN stats so eval-mode normalization is actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    variables = convert_craft_state_dict(sd)

    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(Craft().apply(variables, jnp.asarray(x), train=False))
    assert got.shape == want.shape == (1, 32, 48, 2)
    # bilinear-resize + conv accumulation-order noise through 16 fp32
    # conv layers; structural mismatches show up orders of magnitude larger
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)


def test_rec_converter_numeric_parity(rng):
    torch.manual_seed(1)
    from omniparser_tpu.models.ocr_easy import EASYOCR_EN_CHARSET

    n_cls = len(EASYOCR_EN_CHARSET) + 1
    model = _TorchRec(n_cls).eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    variables = convert_easyocr_rec_state_dict(sd)

    x = rng.standard_normal((2, 64, 128, 1)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(VggCtcRecognizer().apply(variables, jnp.asarray(x), train=False))
    assert got.shape == want.shape == (2, 31, n_cls)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)
