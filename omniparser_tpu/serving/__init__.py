"""Serving: REST contract of the reference's omniparserserver
(omnitool/omniparserserver/omniparserserver.py:34-51) on the Python stdlib
(fastapi is not in this image), plus a micro-batching scheduler that the
reference lacks (it parses one request at a time; we queue and batch to
keep the TPU fed)."""

from omniparser_tpu.serving.http import OmniparserServer, main
from omniparser_tpu.serving.batcher import MicroBatcher

__all__ = ["OmniparserServer", "MicroBatcher", "main"]
