"""OmniBox guest control server contract tests (omnibox/guest/server.py).

Pins the 3-endpoint contract of the reference guest agent
(omnitool/omnibox/vm/win11setup/setupscripts/server/main.py:70-95) on our
stdlib implementation: JSON probe, locked /execute with the reference's
payload shape, raw-PNG /screenshot — plus the action-space validator the
reference leaves unimplemented (main.py:46-54) and the agent-side handling
of both screenshot wire formats.
"""

import base64
import io
import json
import os
import sys
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "omnibox", "guest"))
import server as guest_server  # noqa: E402


def _fake_screen():
    from PIL import Image

    return Image.new("RGB", (640, 400), (10, 120, 200))


@pytest.fixture()
def guest_url():
    agent = guest_server.GuestAgent(allow_exec=True, screenshot_fn=_fake_screen)
    httpd = guest_server.serve("127.0.0.1", 0, agent)
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_probe(guest_url):
    code, ctype, body = _get(guest_url + "/probe")
    assert code == 200
    payload = json.loads(body)
    # reference main.py:70-72 payload shape
    assert payload["status"] == "Probe successful"


def test_screenshot_is_raw_png(guest_url):
    code, ctype, body = _get(guest_url + "/screenshot")
    assert code == 200
    assert ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"  # PNG magic, not JSON
    from PIL import Image

    img = Image.open(io.BytesIO(body))
    assert img.size == (640, 400)


def test_execute_subprocess_contract(guest_url):
    # allow_exec mode == the reference's execute_anything (main.py:14-43):
    # list command, stdout/stderr/returncode in the payload
    code, payload = _post(guest_url + "/execute", {
        "command": [sys.executable, "-c", "print('hello omnibox')"]})
    assert code == 200
    assert payload["status"] == "success"
    assert payload["output"].strip() == "hello omnibox"
    assert payload["returncode"] == 0

    # string commands are shlex-split when shell=False (main.py:21-22)
    code, payload = _post(guest_url + "/execute", {
        "command": f"{sys.executable} -c \"print(6 * 7)\""})
    assert code == 200 and payload["output"].strip() == "42"

    # missing command -> 400 (contract shared with the mock)
    code, payload = _post(guest_url + "/execute", {})
    assert code == 400


def test_execute_safe_mode_rejects_arbitrary_code():
    agent = guest_server.GuestAgent(allow_exec=False, screenshot_fn=_fake_screen)
    code, payload = agent.execute(
        {"command": [sys.executable, "-c", "import os; os.system('whoami')"]})
    assert code == 500 and payload["status"] == "error"
    code, payload = agent.execute({"command": "echo hi", "shell": True})
    assert code == 500 and payload["status"] == "error"


@pytest.mark.parametrize("script", [
    "import pyautogui; pyautogui.moveTo(100, 200)",
    "import pyautogui; pyautogui.dragTo(5, 6, duration=0.5, button='left')",
    "import pyautogui; pyautogui.hotkey('ctrl', 'c')",
    "import pyautogui; pyautogui.typewrite('hi there', interval=0.012)",
    "import pyautogui; pyautogui.click(button='right')",
    "import pyautogui; pyautogui.scroll(-200)",
    "import pyautogui; print(pyautogui.size())",
    "import pyautogui; pyautogui.moveTo(1, 2); pyautogui.click()",
])
def test_validator_accepts_tool_emitted_commands(script):
    assert guest_server.validate_action_command(
        ["python", "-c", script]) == script


@pytest.mark.parametrize("script", [
    "import os; os.system('x')",                      # wrong module
    "import pyautogui; pyautogui.run('bad')",         # non-whitelisted call
    "import pyautogui; pyautogui.moveTo(x, y)",       # non-literal args
    "import pyautogui; pyautogui.click(**kw)",        # starargs
    "import pyautogui, os; pyautogui.click()",        # extra import
    "import pyautogui; eval('1')",                    # non-pyautogui call
    "import pyautogui",                               # no action
    "import pyautogui; pyautogui.screenshot().save('f')",  # chained attr
])
def test_validator_rejects_everything_else(script):
    assert guest_server.validate_action_command(["python", "-c", script]) is None


def test_validator_runs_actions_with_server_interpreter(monkeypatch):
    # safe mode routes validated scripts through run_subprocess with THIS
    # interpreter; fake pyautogui via a sitecustomize-free -c shim by
    # monkeypatching run_subprocess and asserting the exe substitution
    calls = {}

    def fake_run(command, shell):
        calls["command"] = command
        return {"status": "success", "output": "", "error": "", "returncode": 0}

    monkeypatch.setattr(guest_server, "run_subprocess", fake_run)
    agent = guest_server.GuestAgent(allow_exec=False)
    code, payload = agent.execute(
        {"command": ["python", "-c", "import pyautogui; pyautogui.click()"]})
    assert code == 200
    assert calls["command"][0] == sys.executable


def test_computer_tool_accepts_raw_png_screenshot(guest_url):
    # agent-side: ComputerTool.get_screenshot must handle the reference's
    # raw-PNG wire format (screen_capture.py:17-22), not just the mock JSON
    from omniparser_tpu.agent.tools.computer import ComputerTool

    tool = ComputerTool(guest_url, target="XGA", settle_s=0.0)
    b64 = tool.get_screenshot()
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(b64)))
    assert img.size == (1024, 768)  # resized to the XGA target
    assert tool._screen_size == (640, 400)


def test_computer_tool_still_accepts_mock_json():
    from omniparser_tpu.agent.mock_vm import MockVM
    from omniparser_tpu.agent.tools.computer import ComputerTool

    vm = MockVM()
    url = vm.start()
    try:
        tool = ComputerTool(url, target="XGA", settle_s=0.0)
        b64 = tool.get_screenshot()
        assert len(base64.b64decode(b64)) > 100
    finally:
        vm.stop()


# --------------------------------------------------------------------- #
# Container definition structure (can't boot QEMU/KVM in this image, so  #
# pin the contract of the files instead: reference Dockerfile:1-48 and   #
# compose.yml:1-21 semantics — base image, exposed ports, KVM devices,   #
# guest volumes feeding the firstboot + samba-share layout)              #
# --------------------------------------------------------------------- #

_OMNIBOX = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "omnibox")


def test_dockerfile_structure():
    text = open(os.path.join(_OMNIBOX, "Dockerfile")).read()
    assert "FROM qemux/qemu-docker" in text  # same boot chain as reference
    assert "EXPOSE 8006 3389 5000" in text   # NoVNC + RDP + control server
    # guest payload baked into the image for the samba share
    assert "COPY guest/ /omnibox/guest/" in text
    assert "COPY setup/ /omnibox/setup/" in text
    assert 'VERSION="win11e"' in text        # Win 11 Enterprise eval


def test_compose_structure():
    import yaml

    with open(os.path.join(_OMNIBOX, "compose.yml")) as f:
        compose = yaml.safe_load(f)
    svc = compose["services"]["windows"]
    assert svc["privileged"] is True
    assert "/dev/kvm" in svc["devices"]
    # VM sizing mirrors the reference (8G / 4 cores / 20G)
    assert svc["environment"]["RAM_SIZE"] == "8G"
    assert svc["environment"]["CPU_CORES"] == "4"
    assert svc["environment"]["DISK_SIZE"] == "20G"
    ports = set(svc["ports"])
    assert "8006:8006" in ports and "5000:5000" in ports
    mounts = {v.split(":")[1]: v.split(":")[0] for v in svc["volumes"]}
    # firstboot OEM dir and the samba data share come from our guest bundle
    assert mounts["/oem"].endswith("setup")
    assert mounts["/data"].endswith("guest")
    assert "/storage" in mounts  # persistent VM disk
    # every host-side mount source exists in the repo
    for target in ("/oem", "/data"):
        src = os.path.join(_OMNIBOX, mounts[target].lstrip("./"))
        assert os.path.isdir(src), src


def test_answer_xml_structure():
    """Pin the unattended-install answer file (VERDICT r3 #7): same
    capability surface as the reference's win11x64-enterprise-eval.xml —
    hardware-check bypass, GPT partition plan, hidden OOBE, auto-logon
    admin, RDP, and the C:\\OEM\\install.bat first-logon hook."""
    import xml.etree.ElementTree as ET

    path = os.path.join(_OMNIBOX, "vm", "win11def",
                        "win11x64-enterprise-eval.xml")
    text = open(path).read()
    root = ET.parse(path).getroot()
    passes = {e.get("pass") for e in root}
    assert {"windowsPE", "specialize", "oobeSystem"} <= passes
    for needle in (
        "BypassTPMCheck", "BypassSecureBootCheck",          # QEMU has no TPM
        "<WillWipeDisk>true</WillWipeDisk>",
        "<Type>EFI</Type>", "<Type>MSR</Type>",             # GPT layout
        "<AcceptEula>true</AcceptEula>",
        "<HideOnlineAccountScreens>true</HideOnlineAccountScreens>",
        "<SkipMachineOOBE>true</SkipMachineOOBE>",
        "<AutoLogon>",                                       # agent needs a session
        "<fDenyTSConnections>false</fDenyTSConnections>",    # RDP on
        "AllowInsecureGuestAuth",                            # \\host.lan\data
        'if exist "C:\\OEM\\install.bat"',                   # guest bundle hook
    ):
        assert needle in text, needle


def test_boot_chain_structure():
    """Pin the first-party boot-chain scripts: entry.sh sources the full
    stage chain (reference entry.sh:12-23), define.sh resolves the win11e
    alias to an answer file, install.sh injects autounattend + OEM, and
    the Dockerfile ships them into /run."""
    bc = os.path.join(_OMNIBOX, "vm", "buildcontainer")
    entry = open(os.path.join(bc, "entry.sh")).read()
    for stage in ("reset.sh", "define.sh", "install.sh", "disk.sh",
                  "display.sh", "network.sh", "samba.sh", "boot.sh",
                  "proc.sh", "power.sh", "config.sh"):
        assert f". {stage}" in entry, stage
    assert "qemu-system-x86_64" in entry

    define = open(os.path.join(bc, "define.sh")).read()
    assert "win11x64-enterprise-eval" in define
    assert "XML_FILE" in define

    install = open(os.path.join(bc, "install.sh")).read()
    assert "autounattend.xml" in install
    assert "$OEM$" in install          # sources/$OEM$/$1/OEM -> C:\OEM
    assert "genisoimage" in install    # UEFI-bootable remaster

    samba = open(os.path.join(bc, "samba.sh")).read()
    assert "[data]" in samba and "guest ok = yes" in samba

    power = open(os.path.join(bc, "power.sh")).read()
    assert "system_powerdown" in power

    docker = open(os.path.join(_OMNIBOX, "Dockerfile")).read()
    assert "COPY vm/buildcontainer/ /run/" in docker
    assert "COPY vm/win11def/" in docker
