import threading
import time

import numpy as np
import pytest

from omniparser_tpu.utils.profiling import StageTimer, annotate_trace
from omniparser_tpu.utils.health import probe_poll, validate_endpoints
from omniparser_tpu.utils.image import decode_base64_image, encode_image_base64


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0.01
    assert s["b"]["count"] == 1
    t.reset()
    assert t.summary() == {}


def test_annotate_trace_noop():
    with annotate_trace("x"):
        pass


def test_image_roundtrip(rng):
    img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
    b64 = encode_image_base64(img)
    np.testing.assert_array_equal(decode_base64_image(b64), img)


def test_probe_poll_and_validate():
    from omniparser_tpu.agent.mock_vm import MockVM

    vm = MockVM()
    url = vm.start()
    assert probe_poll(f"{url}/probe", timeout_s=5, interval_s=0.1)
    checks = validate_endpoints(vm=f"{url}/probe", nope="http://127.0.0.1:1/probe")
    assert checks == {"vm": True, "nope": False}
    vm.stop()
    assert not probe_poll("http://127.0.0.1:1/probe", timeout_s=0.5, interval_s=0.2)


def test_demo_page_served():
    import http.server
    import urllib.request

    from omniparser_tpu.config import PipelineConfig, ServerConfig
    from omniparser_tpu.serving.http import OmniparserServer

    class FakePipeline:
        def parse_image(self, image_rgb):
            return image_rgb, {}, []

    srv = OmniparserServer(PipelineConfig(), ServerConfig(port=0), pipeline=FakePipeline())
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    html = urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=5).read().decode()
    assert "omniparser_tpu demo" in html and "/parse/" in html
    httpd.shutdown()
    srv.batcher.close()
