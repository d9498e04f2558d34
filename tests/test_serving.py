import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from omniparser_tpu.config import PipelineConfig, ServerConfig
from omniparser_tpu.serving.batcher import MicroBatcher
from omniparser_tpu.serving.http import OmniparserServer
from omniparser_tpu.utils.image import encode_image_base64


class FakePipeline:
    """Stands in for SOMPipeline: echoes image size as one element."""

    def __init__(self):
        self.calls = 0

    def parse_image(self, image_rgb):
        self.calls += 1
        h, w = image_rgb.shape[:2]
        elem = {"type": "icon", "bbox": [0, 0, 1, 1], "interactivity": True,
                "content": f"{w}x{h}", "source": "box_yolo_content_yolo"}
        return image_rgb, {"0": [0, 0, 1, 1]}, [elem]


@pytest.fixture()
def server():
    srv = OmniparserServer(PipelineConfig(), ServerConfig(port=0), pipeline=FakePipeline())
    import http.server

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield srv, port
    httpd.shutdown()
    srv.batcher.close()


def _req(port, path, payload=None):
    url = f"http://127.0.0.1:{port}{path}"
    if payload is None:
        r = urllib.request.urlopen(url, timeout=10)
    else:
        req = urllib.request.Request(
            url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
        )
        r = urllib.request.urlopen(req, timeout=10)
    return r.status, json.loads(r.read())


def test_probe(server):
    _, port = server
    status, body = _req(port, "/probe/")
    assert status == 200 and "ready" in body["message"]


def test_parse_contract(server, rng):
    _, port = server
    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    status, body = _req(port, "/parse/", {"base64_image": encode_image_base64(img)})
    assert status == 200
    assert set(body) == {"som_image_base64", "parsed_content_list", "latency"}
    assert body["parsed_content_list"][0]["content"] == "48x32"
    assert isinstance(body["latency"], float)


def test_parse_bad_request(server):
    _, port = server
    try:
        _req(port, "/parse/", {"wrong_key": "x"})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_unknown_path(server):
    _, port = server
    try:
        _req(port, "/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


import urllib.error  # noqa: E402


def test_microbatcher_groups_requests():
    batches = []

    def process(items):
        batches.append(list(items))
        return [i * 2 for i in items]

    mb = MicroBatcher(process, max_batch=4, batch_window_ms=50)
    futs = [mb.submit(i) for i in range(4)]
    assert [f.result(timeout=5) for f in futs] == [0, 2, 4, 6]
    mb.close()
    assert any(len(b) > 1 for b in batches), f"no batching happened: {batches}"


def test_microbatcher_propagates_errors():
    def process(items):
        raise RuntimeError("boom")

    mb = MicroBatcher(process, max_batch=2, batch_window_ms=1)
    fut = mb.submit(1)
    with pytest.raises(RuntimeError, match="boom"):
        fut.result(timeout=5)
    mb.close()


def test_microbatcher_respects_max_batch():
    sizes = []

    def process(items):
        sizes.append(len(items))
        time.sleep(0.02)
        return items

    mb = MicroBatcher(process, max_batch=2, batch_window_ms=100)
    futs = [mb.submit(i) for i in range(6)]
    [f.result(timeout=5) for f in futs]
    mb.close()
    assert max(sizes) <= 2


@pytest.mark.slow
def test_mesh_served_matches_single_path(rng):
    """--mesh serving route: a ShardedServingPipeline-backed server returns
    element lists identical to the single-chip path (SURVEY.md §2.7 'expose
    mesh/sharding config in the serving layer')."""
    import http.server

    from omniparser_tpu.config import CaptionerConfig, DetectorConfig, OcrConfig
    from omniparser_tpu.models.florence2 import FlorenceCaptioner
    from omniparser_tpu.parallel.mesh import make_mesh
    from omniparser_tpu.parallel.sharded_parse import ShardedServingPipeline
    from omniparser_tpu.pipeline import SOMPipeline
    from tests.test_florence import TINY

    cfg = PipelineConfig(
        detector=DetectorConfig(default_imgsz=128, max_detections=16),
        captioner=CaptionerConfig(batch_size=8, crop_size=32, max_new_tokens=4),
        ocr=OcrConfig(backend="null"),
        # graph-parity test: pin random-init (see test_sharded_parse)
        detector_weights=None,
    )
    inner = SOMPipeline(cfg, captioner=FlorenceCaptioner(cfg.captioner, dims=TINY))
    served = ShardedServingPipeline(inner, make_mesh(dp=4, tp=2))
    srv = OmniparserServer(cfg, ServerConfig(port=0, max_batch=8), pipeline=served)
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        images = [rng.integers(0, 255, (100, 120, 3), dtype=np.uint8) for _ in range(8)]
        # compile the batched graphs up front (b=4 and b=8 paddings): the
        # micro-batcher may form any batch size, and a first-request compile
        # would blow the urllib timeout.  (Sharded-vs-single element parity
        # is test_sharded_parse's job; HERE we pin the serving ROUTE: HTTP ->
        # batcher -> ShardedParse must reproduce direct sharded parses.)
        served.parse_batch(images[:1])
        expected = [e for _, _, e in served.parse_batch(images)]
        results = [None] * 8

        def post(i):
            _, body = _req(port, "/parse/", {"base64_image": encode_image_base64(images[i])})
            results[i] = body["parsed_content_list"]

        threads = [threading.Thread(target=post, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for want, elements in zip(expected, results):
            assert elements is not None, "a POST failed"
            assert len(elements) == len(want)
            for a, b in zip(elements, want):
                # the micro-batcher forms timing-dependent batch sizes; each
                # padded batch compiles its own graph and bf16 vmap fusion
                # reorders reductions => ~1e-5-level bbox noise (same class
                # as test_sharded_parse's detect tolerance).  1e-4 in ratio
                # units is 0.01 px on the 100 px test frame.
                np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-4)
                assert a["content"] == b["content"] and a["source"] == b["source"]
    finally:
        httpd.shutdown()
        srv.batcher.close()


def test_metrics_endpoint(server, rng):
    """GET /metrics/ exposes counters + latency histograms (SURVEY §5:
    reference has print-only observability; ours is a metrics endpoint)."""
    _, port = server
    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    _req(port, "/parse/", {"base64_image": encode_image_base64(img)})
    status, snap = _req(port, "/metrics/")
    assert status == 200
    assert snap["counters"]['responses_total{code="200"}'] >= 1
    hist = snap["histograms"]["parse_latency_seconds"]
    assert hist["count"] == 1 and hist["sum"] > 0
    assert snap["histograms"]["parse_batch_size"]["count"] == 1
    # Prometheus text exposition
    url = f"http://127.0.0.1:{port}/metrics/?format=prometheus"
    r = urllib.request.urlopen(url, timeout=10)
    text = r.read().decode()
    assert "# TYPE parse_latency_seconds histogram" in text
    assert 'parse_latency_seconds_bucket{le="+Inf"} 1' in text


def test_structured_logging(monkeypatch, capsys):
    """OMNIPARSER_LOG=json turns jlog into one JSON line per event."""
    import io

    from omniparser_tpu.utils.metrics import jlog

    monkeypatch.setenv("OMNIPARSER_LOG", "json")
    buf = io.StringIO()
    jlog("parse", _stream=buf, latency_s=0.12, elements=7)
    rec = json.loads(buf.getvalue())
    assert rec["event"] == "parse" and rec["elements"] == 7 and "ts" in rec
    monkeypatch.delenv("OMNIPARSER_LOG")
    buf2 = io.StringIO()
    jlog("parse", _stream=buf2)
    assert buf2.getvalue() == ""  # disabled by default


def test_concurrent_clients_no_cross_talk(server, rng):
    """Race check: 24 concurrent clients with DISTINCT images through the
    micro-batcher; every response must carry its own request's payload
    (batch grouping must never swap or drop per-request outputs).  The
    reference serves one FastAPI handler per request and has no batching
    layer to get this wrong; our MicroBatcher does, so pin it."""
    import concurrent.futures

    srv, port = server

    def one(i):
        # unique image size => unique FakePipeline echo content
        w, h = 32 + i, 24 + i
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        code, payload = _req(port, "/parse/",
                             {"base64_image": encode_image_base64(img)})
        assert code == 200
        return i, payload["parsed_content_list"][0]["content"], f"{w}x{h}"

    with concurrent.futures.ThreadPoolExecutor(max_workers=12) as ex:
        for i, got, want in ex.map(one, range(24)):
            assert got == want, f"request {i}: got {got}, want {want}"
