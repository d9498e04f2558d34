"""Computer-use tool: validated GUI actions -> pyautogui commands in the VM.

Mirrors the reference's tool contract (omnitool/gradio/tools/computer.py):
the action enum (:20-33), argument validation (:108-225), pyautogui
one-liners POSTed to the guest's /execute (:227-257), resolution scaling to
the nearest SDK target (:41-45, 278-308), and screenshots via the guest's
/screenshot resized to the target (:tools/screen_capture.py:10-29).
"""

from __future__ import annotations

import base64
import dataclasses
import io
import time
from typing import Any, Dict, List, Optional, Tuple

import requests

ACTIONS = {
    "key", "type", "mouse_move", "left_click", "left_click_drag", "right_click",
    "middle_click", "double_click", "screenshot", "cursor_position", "hover",
    "wait", "scroll_up", "scroll_down",
}

# SDK-blessed target resolutions (reference computer.py:41-45)
MAX_SCALING_TARGETS: Dict[str, Tuple[int, int]] = {
    "XGA": (1024, 768),
    "WXGA": (1280, 800),
    "FWXGA": (1366, 768),
}

TYPING_DELAY_MS = 12
ACTION_SETTLE_S = 0.7  # reference sleeps after each action (computer.py:245)


class ToolError(Exception):
    def __init__(self, message: str):
        self.message = message
        super().__init__(message)


@dataclasses.dataclass(frozen=True)
class ToolResult:
    output: Optional[str] = None
    error: Optional[str] = None
    base64_image: Optional[str] = None

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class ComputerTool:
    """Translate one validated action into guest commands."""

    name = "computer"
    api_type = "computer_20241022"

    def __init__(self, vm_url: str, target: str = "XGA", settle_s: float = ACTION_SETTLE_S):
        self.vm_url = vm_url.rstrip("/")
        self.target_w, self.target_h = MAX_SCALING_TARGETS[target]
        self.settle_s = settle_s
        self._screen_size: Optional[Tuple[int, int]] = None

    # ------------------------- guest I/O ------------------------- #

    def send_to_vm(self, command: str, timeout: float = 90) -> str:
        """POST a pyautogui one-liner to the guest /execute
        (reference computer.py:227-257)."""
        resp = requests.post(
            f"{self.vm_url}/execute", json={"command": ["python", "-c", command]},
            timeout=timeout,
        )
        if resp.status_code != 200:
            raise ToolError(f"VM execute failed [{resp.status_code}]: {resp.text[:200]}")
        return resp.json().get("output", "")

    def get_screenshot(self) -> str:
        """Guest screenshot -> base64 PNG resized to the target resolution.

        Screenshots are idempotent, so transient VM hiccups are retried
        with backoff (actions in send_to_vm are NOT — replaying a click
        that may have landed is a correctness bug)."""
        from PIL import Image

        from omniparser_tpu.utils.retry import retry_call

        resp = retry_call(
            lambda: requests.get(f"{self.vm_url}/screenshot", timeout=90))
        if resp.status_code != 200:
            raise ToolError(f"VM screenshot failed [{resp.status_code}]")
        # the reference guest returns raw PNG bytes (omnibox server
        # main.py:81-95 send_file; consumed by screen_capture.py:17-22);
        # the in-repo mock wraps base64 in JSON — accept both
        if resp.headers.get("Content-Type", "").startswith("image/"):
            raw = resp.content
        else:
            raw = base64.b64decode(resp.json()["screenshot"])
        img = Image.open(io.BytesIO(raw))
        self._screen_size = img.size
        img = img.resize((self.target_w, self.target_h))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode("ascii")

    def screen_size(self) -> Tuple[int, int]:
        if self._screen_size is None:
            out = self.send_to_vm(
                "import pyautogui; print(pyautogui.size())"
            )
            try:
                nums = out.split("(")[1].split(")")[0].split(",")
                self._screen_size = (int(nums[0].split("=")[-1]), int(nums[1].split("=")[-1]))
            except (IndexError, ValueError):
                self._screen_size = (self.target_w, self.target_h)
        return self._screen_size

    def scale_coordinates(self, x: float, y: float) -> Tuple[int, int]:
        """Model coords (target resolution) -> real screen pixels
        (reference computer.py:278-308)."""
        w, h = self.screen_size()
        return int(x * w / self.target_w), int(y * h / self.target_h)

    # ------------------------- dispatch -------------------------- #

    def __call__(self, *, action: str, text: Optional[str] = None,
                 coordinate: Optional[List[float]] = None, **_ignored) -> ToolResult:
        if action not in ACTIONS:
            raise ToolError(f"Invalid action: {action}")

        if action in ("mouse_move", "left_click_drag"):
            if coordinate is None:
                raise ToolError(f"coordinate is required for {action}")
            x, y = self.scale_coordinates(*coordinate)
            if action == "mouse_move":
                self._do(f"import pyautogui; pyautogui.moveTo({x}, {y})")
            else:
                self._do(f"import pyautogui; pyautogui.dragTo({x}, {y}, duration=0.5, button='left')")
            return ToolResult(output=f"{action} to ({x}, {y})")

        if action in ("key", "type"):
            if text is None:
                raise ToolError(f"text is required for {action}")
            if action == "key":
                # escape like the 'type' branch: LLM-chosen key names must
                # not break out of the quoted pyautogui one-liner
                keys = "', '".join(
                    k.replace("\\", "\\\\").replace("'", "\\'")
                    for k in text.split("+")
                )
                self._do(f"import pyautogui; pyautogui.hotkey('{keys}')")
            else:
                safe = text.replace("\\", "\\\\").replace("'", "\\'")
                self._do(
                    f"import pyautogui; pyautogui.typewrite('{safe}', interval={TYPING_DELAY_MS/1000})"
                )
            return ToolResult(output=f"{action}: {text}")

        if action in ("left_click", "right_click", "double_click", "middle_click", "hover"):
            if coordinate is not None:
                x, y = self.scale_coordinates(*coordinate)
                self._do(f"import pyautogui; pyautogui.moveTo({x}, {y})")
            cmd = {
                "left_click": "pyautogui.click()",
                "right_click": "pyautogui.click(button='right')",
                "middle_click": "pyautogui.click(button='middle')",
                "double_click": "pyautogui.doubleClick()",
                "hover": "pass",
            }[action]
            if cmd != "pass":
                self._do(f"import pyautogui; {cmd}")
            return ToolResult(output=action)

        if action in ("scroll_up", "scroll_down"):
            amount = 200 if action == "scroll_up" else -200
            self._do(f"import pyautogui; pyautogui.scroll({amount})")
            return ToolResult(output=action)

        if action == "wait":
            time.sleep(1.0)
            return ToolResult(output="waited")

        if action == "cursor_position":
            out = self.send_to_vm("import pyautogui; print(pyautogui.position())")
            return ToolResult(output=out)

        if action == "screenshot":
            return ToolResult(base64_image=self.get_screenshot())

        raise ToolError(f"unhandled action {action}")  # pragma: no cover

    def _do(self, command: str):
        self.send_to_vm(command)
        time.sleep(self.settle_s)

    def to_params(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "type": self.api_type,
            "display_width_px": self.target_w,
            "display_height_px": self.target_h,
            "display_number": None,
        }


class ToolCollection:
    """Dispatch tool_use blocks to tools by name (reference collection.py)."""

    def __init__(self, *tools):
        self.tools = {t.name: t for t in tools}

    def run(self, *, name: str, tool_input: Dict[str, Any]) -> ToolResult:
        tool = self.tools.get(name)
        if tool is None:
            return ToolResult(error=f"unknown tool {name}")
        try:
            return tool(**tool_input)
        except ToolError as e:
            return ToolResult(error=e.message)

    def to_params(self):
        return [t.to_params() for t in self.tools.values()]
