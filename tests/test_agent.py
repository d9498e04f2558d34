import http.server
import json
import threading

import numpy as np
import pytest

from omniparser_tpu.agent.llm import MockLLM, estimate_cost
from omniparser_tpu.agent.loop import sampling_loop_sync
from omniparser_tpu.agent.mock_vm import MockVM
from omniparser_tpu.agent.tools.computer import ComputerTool, ToolCollection, ToolResult
from omniparser_tpu.agent.vlm_agent import (
    VLMAgent,
    box_id_to_coords,
    make_tool_use_blocks,
    parse_agent_response,
)
from omniparser_tpu.config import PipelineConfig, ServerConfig
from omniparser_tpu.serving.http import OmniparserServer


@pytest.fixture(scope="module")
def vm():
    vm = MockVM()
    url = vm.start()
    yield vm, url
    vm.stop()


@pytest.fixture(scope="module")
def parse_server():
    class FakePipeline:
        def parse_image(self, image_rgb):
            elems = [
                {"type": "text", "bbox": [0.1, 0.1, 0.3, 0.15], "interactivity": False,
                 "content": "File", "source": "box_ocr_content_ocr"},
                {"type": "icon", "bbox": [0.5, 0.5, 0.6, 0.6], "interactivity": True,
                 "content": "save button", "source": "box_yolo_content_yolo"},
            ]
            return image_rgb, {}, elems

    srv = OmniparserServer(PipelineConfig(), ServerConfig(port=0), pipeline=FakePipeline())
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    srv.batcher.close()


def test_mock_vm_contract(vm):
    import requests

    _, url = vm
    assert requests.get(f"{url}/probe").status_code == 200
    shot = requests.get(f"{url}/screenshot").json()["screenshot"]
    assert len(shot) > 1000
    r = requests.post(f"{url}/execute", json={"command": ["python", "-c", "print(1)"]})
    assert r.json()["status"] == "success"
    r = requests.post(f"{url}/execute", json={})
    assert r.status_code == 400


def test_computer_tool_actions(vm):
    vm_obj, url = vm
    tool = ComputerTool(url, settle_s=0.0)
    n0 = len(vm_obj.commands)
    res = tool(action="left_click", coordinate=[512, 384])
    assert res.error is None
    assert any("pyautogui.click()" in " ".join(c) for c in vm_obj.commands[n0:])
    # XGA (1024x768) -> 1920x1080 scaling: 512 -> 960, 384 -> 540
    assert any("moveTo(960, 540)" in " ".join(c) for c in vm_obj.commands[n0:])

    res = tool(action="type", text="hello 'world'")
    assert res.error is None
    res = tool(action="screenshot")
    assert res.base64_image and len(res.base64_image) > 1000

    from omniparser_tpu.agent.tools.computer import ToolError

    with pytest.raises(ToolError):
        tool(action="left_click_drag")  # missing coordinate
    with pytest.raises(ToolError):
        tool(action="fly")


def test_tool_collection_unknown_tool(vm):
    _, url = vm
    tools = ToolCollection(ComputerTool(url, settle_s=0.0))
    res = tools.run(name="nope", tool_input={})
    assert res.error


def test_parse_agent_response_variants():
    fenced = 'blah\n```json\n{"Reasoning": "r", "Next Action": "left_click", "Box ID": 1}\n```'
    assert parse_agent_response(fenced)["Box ID"] == 1
    bare = '{"Reasoning": "r", "Next Action": "None"}'
    assert parse_agent_response(bare)["Next Action"] == "None"


def test_box_id_to_coords():
    elems = [{"bbox": [0.2, 0.4, 0.4, 0.6]}]
    assert box_id_to_coords(0, elems, (1000, 500)) == (300, 250)


def test_make_tool_use_blocks_click_and_type():
    elems = [{"bbox": [0.0, 0.0, 0.2, 0.2]}]
    blocks = make_tool_use_blocks(
        {"Next Action": "left_click", "Box ID": 0}, elems, (100, 100)
    )
    assert [b["input"]["action"] for b in blocks] == ["mouse_move", "left_click"]
    # reference emits mouse_move (not a click) before type (vlm_agent.py:184-190)
    blocks = make_tool_use_blocks(
        {"Next Action": "type", "Box ID": 0, "value": "hi"}, elems, (100, 100)
    )
    assert [b["input"]["action"] for b in blocks] == ["mouse_move", "type"]
    assert blocks[-1]["input"]["text"] == "hi"
    assert make_tool_use_blocks({"Next Action": "None"}, elems, (100, 100)) == []


def test_make_tool_use_blocks_bad_box_id():
    elems = [{"bbox": [0.0, 0.0, 0.2, 0.2]}]
    # hallucinated / negative / non-numeric ids degrade to no action
    for bad in (42, -1, "3."):
        blocks = make_tool_use_blocks(
            {"Next Action": "left_click", "Box ID": bad}, elems, (100, 100)
        )
        assert blocks == [], bad
    # untargeted actions still work with a bad id attached
    blocks = make_tool_use_blocks(
        {"Next Action": "scroll_down", "Box ID": 99}, elems, (100, 100)
    )
    assert [b["input"]["action"] for b in blocks] == ["scroll_down"]


def test_prune_images_budget_and_no_empty_content():
    agent = VLMAgent(model="m", client=lambda *a, **k: ("{}", {}), max_images=2)
    img_msg = lambda: {"role": "user", "content": [
        {"type": "image", "source": {"data": "x"}}]}
    pruned = agent._prune_images([img_msg(), img_msg(), img_msg()])
    total_imgs = sum(1 for m in pruned for b in m["content"] if b["type"] == "image")
    # budget = max_images - 1 (the fresh screenshot is appended afterwards)
    assert total_imgs == 1
    assert all(m["content"] for m in pruned)  # no empty content lists


def test_sampling_loop_end_to_end(vm, parse_server):
    """Full loop against mock VM + real HTTP parse server + scripted LLM."""
    vm_obj, vm_url = vm
    llm = MockLLM([
        '```json\n{"Reasoning": "click save", "Next Action": "left_click", "Box ID": 1}\n```',
        '```json\n{"Reasoning": "done", "Next Action": "None"}\n```',
    ])
    turns = list(
        sampling_loop_sync(
            task="save the file", model="omniparser + gpt-4o", provider="mock",
            llm_client=llm, omniparser_url=parse_server, vm_url=vm_url, max_turns=5,
        )
    )
    assert len(turns) == 2
    assert turns[0]["action"]["Next Action"] == "left_click"
    assert turns[1]["action"]["Next Action"] == "None"
    # the click actually reached the mock VM
    assert any("pyautogui.click()" in " ".join(c) for c in vm_obj.commands)
    # screen_info lines reached the LLM prompt
    sys_prompt = llm.calls[0]["system"]
    assert "ID: 1, Icon: save button" in sys_prompt


def test_orchestrated_agent_trajectory(tmp_path, vm, parse_server):
    vm_obj, vm_url = vm
    llm = MockLLM([
        '```json\n{"plan": ["open menu", "click save"]}\n```',
        '```json\n{"Reasoning": "click", "Next Action": "left_click", "Box ID": 1}\n```',
        '```json\n{"is_request_satisfied": {"answer": true, "reason": "done"},'
        ' "is_progress_being_made": {"answer": true, "reason": "ok"},'
        ' "next_instruction": {"answer": "stop", "reason": "done"}}\n```',
        '```json\n{"Reasoning": "done", "Next Action": "None"}\n```',
    ])
    save = str(tmp_path / "traj")
    turns = list(
        sampling_loop_sync(
            task="save", model="omniparser + gpt-4o-orchestrated", provider="mock",
            llm_client=llm, omniparser_url=parse_server, vm_url=vm_url,
            max_turns=5, save_folder=save,
        )
    )
    assert len(turns) == 2
    import os

    assert os.path.exists(os.path.join(save, "plan.json"))
    lines = open(os.path.join(save, "trajectory.json")).read().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert {"step", "action", "ledger", "latency_s"} <= set(rec)
    assert os.path.exists(os.path.join(save, "step0_som.png"))


def test_estimate_cost():
    assert estimate_cost("gpt-4o", 1_000_000, 0) == 2.5
    assert estimate_cost("unknown-model", 100, 100) == 0.0


def test_anthropic_prune_images():
    from omniparser_tpu.agent.anthropic_agent import prune_images

    def msg(n_imgs):
        return {"role": "user", "content": [
            {"type": "tool_result", "tool_use_id": "x", "content": [
                {"type": "image", "source": {"data": f"img{i}"}} for i in range(n_imgs)
            ]}
        ]}

    msgs = [msg(1), msg(1), msg(1)]
    pruned = prune_images(msgs, keep_n=2)
    total = sum(
        1
        for m in pruned
        for b in m["content"]
        for c in b["content"]
        if c.get("type") == "image"
    )
    assert total == 2
    # newest messages keep their images
    assert pruned[-1]["content"][0]["content"]


def test_anthropic_loop_with_fake_client(vm):
    """Claude computer-use branch: actor sees tools, screenshots flow back
    as tool_result blocks, no omniparser server involved."""
    vm_obj, vm_url = vm

    calls = []

    def fake_anthropic(messages, system, tools, max_tokens=4096):
        calls.append({"messages": messages, "tools": tools})
        if len(calls) == 1:
            return [
                {"type": "text", "text": "Let me look at the screen."},
                {"type": "tool_use", "id": "toolu_1", "name": "computer",
                 "input": {"action": "screenshot"}},
            ], {"input_tokens": 5, "output_tokens": 5}
        return [{"type": "text", "text": "Done."}], {"input_tokens": 5, "output_tokens": 2}

    turns = list(
        sampling_loop_sync(
            task="look at the screen", model="claude-3-5-sonnet-20241022",
            provider="anthropic", llm_client=fake_anthropic,
            omniparser_url="http://unused", vm_url=vm_url, max_turns=4,
        )
    )
    assert len(turns) == 2
    # the computer tool spec reached the API call
    assert calls[0]["tools"][0]["type"] == "computer_20241022"
    # the screenshot came back as an image tool_result
    tr = turns[0]["tool_results"][0]
    assert any(c["type"] == "image" for c in tr["content"])


def test_anthropic_provider_clients(monkeypatch):
    """Provider switch (reference anthropic_agent.py:74-79): each client
    builds the right endpoint/auth/body without network."""
    from omniparser_tpu.agent import llm as llm_mod
    from omniparser_tpu.agent.llm import make_anthropic_client

    captured = {}

    class _Resp:
        status_code = 200

        @staticmethod
        def json():
            return {"content": [{"type": "text", "text": "ok"}], "usage": {}}

    def fake_post(url, **kw):
        captured["url"] = url
        captured["kw"] = kw
        return _Resp()

    monkeypatch.setattr(llm_mod.requests, "post", fake_post)

    msgs = [{"role": "user", "content": "hi"}]
    c = make_anthropic_client("anthropic", "claude-3-5-sonnet-20241022")
    c(msgs, "sys", [])
    assert captured["url"].endswith("/v1/messages")
    assert captured["kw"]["headers"]["anthropic-beta"] == "computer-use-2024-10-22"

    b = make_anthropic_client(
        "bedrock", "anthropic.claude-3-5-sonnet-20241022-v2:0",
        region="us-west-2", access_key="AK", secret_key="SK",
    )
    b(msgs, "sys", [])
    assert "bedrock-runtime.us-west-2.amazonaws.com" in captured["url"]
    auth = captured["kw"]["headers"]["authorization"]
    assert auth.startswith("AWS4-HMAC-SHA256 Credential=AK/")
    assert "us-west-2/bedrock/aws4_request" in auth
    import json as _json

    body = _json.loads(captured["kw"]["data"])
    assert body["anthropic_version"] == "bedrock-2023-05-31"

    v = make_anthropic_client("vertex", "claude-3-5-sonnet-v2@20241022",
                              project="proj", region="us-east5",
                              access_token="tok")
    v(msgs, "sys", [])
    assert "us-east5-aiplatform.googleapis.com" in captured["url"]
    assert "/publishers/anthropic/models/claude-3-5-sonnet-v2@20241022:rawPredict" in captured["url"]
    assert captured["kw"]["headers"]["Authorization"] == "Bearer tok"
    assert captured["kw"]["json"]["anthropic_version"] == "vertex-2023-10-16"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_anthropic_client("nope", "m")


def test_agent_console_end_to_end(vm, parse_server):
    """Chat console (reference omnitool/gradio/app.py): /run starts a
    sampling loop against real HTTP servers; /state streams turn events;
    pre-run probes reject bad server URLs (app.py:189-208)."""
    import time
    import urllib.request

    from omniparser_tpu.agent.console import AgentConsole
    from omniparser_tpu.agent.llm import MockLLM

    _, vm_url = vm
    script = json.dumps({
        "Reasoning": "click the save button",
        "Next Action": "left_click", "Box ID": 1,
    })

    console = AgentConsole(
        parse_server, vm_url,
        llm_client_factory=lambda *a, **k: MockLLM([script]))
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), console.make_handler())
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def req(path, payload=None):
            url = f"http://127.0.0.1:{port}{path}"
            if payload is None:
                r = urllib.request.urlopen(url, timeout=10)
            else:
                r = urllib.request.urlopen(urllib.request.Request(
                    url, json.dumps(payload).encode()), timeout=10)
            return json.loads(r.read())

        sid = req("/run", {"task": "save the file", "model": "omniparser + gpt-4o",
                           "provider": "mock"})["sid"]
        for _ in range(100):
            state = req(f"/state?sid={sid}")
            if state["done"]:
                break
            time.sleep(0.1)
        assert state["done"] and state["error"] is None
        assert len(state["events"]) >= 1
        ev = state["events"][0]
        assert ev["reasoning"] == "click the save button"
        assert any(a["name"] == "computer" for a in ev["actions"])
        assert ev["som_image_base64"] and ev["n_elements"] == 2

        # pre-run probe validation: dead VM URL -> 400 with a clear error
        bad = AgentConsole(parse_server, "http://127.0.0.1:9",
                           llm_client_factory=lambda *a, **k: MockLLM([]))
        with pytest.raises(ConnectionError, match="VM not ready"):
            bad.start_session("t", "mock", "mock")
    finally:
        httpd.shutdown()


def test_retry_call_and_wait_until_ready(vm, monkeypatch):
    """Bounded retry for idempotent calls + probe-poll readiness
    (SURVEY §5: the reference has no retry story; manage_vm.sh:14-21
    polls /probe in shell)."""
    import requests

    from omniparser_tpu.utils.retry import retry_call, wait_until_ready

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise requests.ConnectionError("transient")
        return "ok"

    assert retry_call(flaky, backoff_s=0.01) == "ok" and calls["n"] == 3

    with pytest.raises(requests.ConnectionError):  # exhaustion re-raises
        retry_call(lambda: (_ for _ in ()).throw(requests.ConnectionError("x")),
                   retries=1, backoff_s=0.01)

    with pytest.raises(ValueError):  # non-retryable propagates immediately
        retry_call(lambda: (_ for _ in ()).throw(ValueError("no")), backoff_s=0.01)

    _, url = vm
    assert wait_until_ready(url, timeout_s=5)
    assert not wait_until_ready("http://127.0.0.1:9", timeout_s=1.5, interval_s=0.3)


def test_screenshot_retries_transient_failure(vm, monkeypatch):
    """ComputerTool.get_screenshot survives one dropped connection; actions
    (send_to_vm) are never retried — a timed-out click may have landed."""
    import requests as _requests

    from omniparser_tpu.agent.tools import computer as computer_mod

    _, url = vm
    tool = ComputerTool(url, settle_s=0.0)
    real_get = _requests.get
    state = {"fails": 1}

    def flaky_get(*a, **kw):
        if state["fails"] > 0:
            state["fails"] -= 1
            raise _requests.ConnectionError("dropped")
        return real_get(*a, **kw)

    monkeypatch.setattr(computer_mod.requests, "get", flaky_get)
    shot = tool.get_screenshot()
    assert shot and len(shot) > 1000

    # send_to_vm: a connection error surfaces immediately, no replay
    calls = {"n": 0}

    def failing_post(*a, **kw):
        calls["n"] += 1
        raise _requests.ConnectionError("dropped")

    monkeypatch.setattr(computer_mod.requests, "post", failing_post)
    with pytest.raises(_requests.ConnectionError):
        tool.send_to_vm("print(1)")
    assert calls["n"] == 1
