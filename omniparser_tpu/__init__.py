"""omniparser_tpu — a TPU-native screen-parsing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
microsoft/OmniParser (reference: /root/reference): turn a raw GUI
screenshot into a structured list of UI elements
``{type, bbox, interactivity, content, source}`` plus a numbered
Set-of-Mark (SOM) overlay, by running

  1. a YOLOv8-class icon detector           (Flax, jitted, on-device NMS)
  2. an OCR stage                            (JAX DBNet-style det + CTC rec,
                                              pluggable host backends)
  3. a vectorized overlap/merge pass         (fixed-shape masked ops —
                                              reference: util/utils.py:231-309)
  4. a Florence-2-class icon captioner       (DaViT + BART enc/dec,
                                              KV-cache greedy decode)

around a fixed-shape, batch-first compute graph: a screenshot enters HBM
once; detect -> suppress/merge -> crop-gather -> caption all stay on device.

Top-level API (mirrors the reference's public surface,
util/omniparser.py:7-32 and util/utils.py:407,504):

    from omniparser_tpu import Omniparser, PipelineConfig
    parser = Omniparser(PipelineConfig())
    som_image_b64, elements = parser.parse(image_base64)
"""

__version__ = "0.1.0"

from omniparser_tpu.config import PipelineConfig, DetectorConfig, CaptionerConfig, OcrConfig

__all__ = [
    "PipelineConfig",
    "DetectorConfig",
    "CaptionerConfig",
    "OcrConfig",
    "Omniparser",
]


def __getattr__(name):
    # Lazy import: keep `import omniparser_tpu` cheap (no jax/model imports)
    if name == "Omniparser":
        from omniparser_tpu.pipeline import Omniparser

        return Omniparser
    raise AttributeError(f"module 'omniparser_tpu' has no attribute {name!r}")
