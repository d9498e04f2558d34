"""Mock OmniBox guest server for CI (SURVEY.md §2.4, §4).

Implements the 3-endpoint contract of the reference's guest Flask server
(omnitool/omnibox/vm/win11setup/setupscripts/server/main.py:70-95):

  GET  /probe       -> 200 {"status": "Probe successful", ...}
  POST /execute     -> runs nothing; records the command, returns canned
                       output (the reference's shipped /execute is itself a
                       deliberate stub, main.py:46-54)
  GET  /screenshot  -> synthetic desktop PNG (base64)

Anything answering these three endpoints substitutes for the real
Docker/QEMU Windows VM — the real OmniBox is out of TPU scope by design.
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple

import numpy as np


class MockVM:
    def __init__(self, screen=(1920, 1080)):
        self.screen = screen
        self.commands: List[list] = []
        self.cursor = (100, 100)
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------ #

    def screenshot_png_b64(self) -> str:
        from PIL import Image, ImageDraw

        w, h = self.screen
        img = Image.new("RGB", (w, h), (0, 120, 212))  # desktop blue
        d = ImageDraw.Draw(img)
        d.rectangle([0, h - 48, w, h], fill=(32, 32, 32))  # taskbar
        d.rectangle([40, 40, 360, 240], fill=(255, 255, 255))  # a window
        d.text((52, 52), "Mock OmniBox", fill=(0, 0, 0))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode("ascii")

    def handle_execute(self, command) -> dict:
        self.commands.append(command)
        joined = " ".join(command) if isinstance(command, list) else str(command)
        if "pyautogui.size" in joined:
            return {"status": "success", "output": f"Size(width={self.screen[0]}, height={self.screen[1]})", "error": ""}
        if "pyautogui.position" in joined:
            return {"status": "success", "output": f"Point(x={self.cursor[0]}, y={self.cursor[1]})", "error": ""}
        return {"status": "success", "output": "", "error": ""}

    # ------------------------------------------------------------ #

    def make_handler(self):
        vm = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _send(self, code, payload):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path.rstrip("/") == "/probe":
                    self._send(200, {"status": "Probe successful"})
                elif self.path.rstrip("/") == "/screenshot":
                    self._send(200, {"screenshot": vm.screenshot_png_b64()})
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path.rstrip("/") != "/execute":
                    self._send(404, {"error": "not found"})
                    return
                length = int(self.headers.get("Content-Length", 0))
                data = json.loads(self.rfile.read(length) or b"{}")
                if "command" not in data:
                    self._send(400, {"status": "error", "message": "command is required"})
                    return
                self._send(200, vm.handle_execute(data["command"]))

        return Handler

    def start(self, port: int = 0) -> str:
        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), self.make_handler())
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return f"http://127.0.0.1:{self._httpd.server_address[1]}"

    def stop(self):
        if self._httpd:
            self._httpd.shutdown()
