"""OmniBox guest control server — single-file, stdlib-only.

First-party rebuild of the reference guest agent
(/root/reference/omnitool/omnibox/vm/win11setup/setupscripts/server/main.py:1-98),
designed to run inside the Windows VM with nothing but a Python install
(+ pyautogui for real input/screenshots).  Differences from the reference,
all deliberate:

  * stdlib http.server instead of Flask (the guest needs zero pip deps
    beyond pyautogui; the reference ships a requirements.txt the setup
    script must install).
  * The reference ships /execute as a deliberate 500 stub and asks users
    to write an "action space aware implementation" (main.py:46-54).
    This server SHIPS that implementation: `validate_action_command`
    AST-checks that the command is exactly a pyautogui one-liner of the
    shapes the computer-use tool emits (agent/tools/computer.py), with
    literal-only arguments — no attribute chains, no arbitrary code.
    `--allow-exec` opts into the reference's `execute_anything` behavior
    (unrestricted subprocess, 120 s timeout, ~ expansion) for testing.
  * /screenshot returns a raw PNG body (image/png), byte-compatible with
    the reference contract (main.py:81-95, send_file) that
    tools/screen_capture.py:17-22 consumes; the cursor is pasted in when
    a cursor image + pyautogui are available.

Endpoints (contract pinned by tests/test_omnibox.py):
  GET  /probe       -> 200 {"status": "Probe successful", ...}
  POST /execute     -> {"status", "output", "error", "returncode"} under a
                       global lock (one command at a time, main.py:68-79)
  GET  /screenshot  -> image/png bytes
"""

from __future__ import annotations

import argparse
import ast
import io
import json
import logging
import os
import shlex
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

EXEC_TIMEOUT_S = 120  # reference main.py:31

# pyautogui calls the computer-use tool emits (agent/tools/computer.py /
# reference tools/computer.py:227-257) plus the introspection helpers.
ALLOWED_CALLS = {
    "moveTo", "dragTo", "click", "doubleClick", "hotkey", "typewrite",
    "scroll", "size", "position", "press", "keyDown", "keyUp",
}

log = logging.getLogger("omnibox.guest")


# --------------------------------------------------------------------- #
# /execute implementations
# --------------------------------------------------------------------- #

def validate_action_command(command) -> str | None:
    """Return the pyautogui one-liner if `command` is a safe action command,
    else None.

    Accepts exactly ["python", "-c", script] (any python executable name)
    where script parses as:  import pyautogui; <stmt>{1,n}
    and every statement is pyautogui.<allowed>(literals...) optionally
    wrapped in print(...).  Literal-only arguments mean an LLM cannot
    smuggle attribute access, imports, or string evaluation through the
    action channel.
    """
    if not (isinstance(command, list) and len(command) == 3):
        return None
    exe, flag, script = command
    if flag != "-c" or not isinstance(script, str):
        return None
    if os.path.basename(str(exe)).split(".")[0] not in ("python", "python3"):
        return None
    try:
        tree = ast.parse(script)
    except SyntaxError:
        return None
    if not tree.body:
        return None
    first = tree.body[0]
    if not (isinstance(first, ast.Import) and len(first.names) == 1
            and first.names[0].name == "pyautogui"):
        return None

    def is_literal(node) -> bool:
        if isinstance(node, ast.Constant):
            return True
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.USub, ast.UAdd)):
            return isinstance(node.operand, ast.Constant)
        return False

    def ok_call(call) -> bool:
        if not isinstance(call, ast.Call):
            return False
        f = call.func
        if not (isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name)
                and f.value.id == "pyautogui" and f.attr in ALLOWED_CALLS):
            return False
        return (all(is_literal(a) for a in call.args)
                and all(kw.arg is not None and is_literal(kw.value)
                        for kw in call.keywords))

    for stmt in tree.body[1:]:
        if not isinstance(stmt, ast.Expr):
            return None
        call = stmt.value
        if (isinstance(call, ast.Call) and isinstance(call.func, ast.Name)
                and call.func.id == "print" and len(call.args) == 1
                and not call.keywords):
            call = call.args[0]
        if not ok_call(call):
            return None
    if len(tree.body) == 1:
        return None  # bare import does nothing
    return script


def run_subprocess(command, shell: bool) -> dict:
    """The reference's execute_anything semantics (main.py:14-43):
    shlex-split strings (non-shell), expand ~/ arguments, 120 s timeout."""
    if isinstance(command, str) and not shell:
        command = shlex.split(command)
    if isinstance(command, list):
        command = [os.path.expanduser(a) if isinstance(a, str) and a.startswith("~/")
                   else a for a in command]
    result = subprocess.run(
        command, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        shell=shell, text=True, timeout=EXEC_TIMEOUT_S,
    )
    return {
        "status": "success",
        "output": result.stdout,
        "error": result.stderr,
        "returncode": result.returncode,
    }


class GuestAgent:
    """State + handlers; the HTTP layer below is a thin shim around this."""

    def __init__(self, allow_exec: bool = False, cursor_path: str | None = None,
                 screenshot_fn=None, python_exe: str | None = None):
        self.allow_exec = allow_exec
        self.cursor_path = cursor_path
        self.python_exe = python_exe or sys.executable
        # injectable for CI (no display / no pyautogui): () -> PIL.Image
        self._screenshot_fn = screenshot_fn
        # one command at a time (reference computer_control_lock, main.py:68)
        self.lock = threading.Lock()

    # ------------------------------ execute --------------------------- #

    def execute(self, data: dict):
        """Returns (http_status, payload)."""
        command = data.get("command", "" if data.get("shell") else [])
        shell = bool(data.get("shell", False))
        if self.allow_exec:
            try:
                return 200, run_subprocess(command, shell)
            except Exception as e:  # timeout, missing binary, ...
                log.exception("execute failed")
                return 500, {"status": "error", "message": str(e)}
        script = None if shell else validate_action_command(command)
        if script is None:
            return 500, {
                "status": "error",
                "message": "Command rejected: only literal pyautogui action "
                           "one-liners are allowed (run with --allow-exec to "
                           "lift this for testing).",
            }
        try:
            # run validated actions with THIS interpreter (the one that has
            # pyautogui), regardless of what 'python' resolves to in PATH
            return 200, run_subprocess([self.python_exe, "-c", script], False)
        except Exception as e:
            log.exception("action failed")
            return 500, {"status": "error", "message": str(e)}

    # ----------------------------- screenshot ------------------------- #

    def screenshot_png(self) -> bytes:
        """Raw PNG of the screen with the cursor pasted in
        (reference main.py:81-95)."""
        if self._screenshot_fn is not None:
            img = self._screenshot_fn()
        else:
            import pyautogui  # only needed on the real guest
            from PIL import Image

            img = pyautogui.screenshot()
            if self.cursor_path and os.path.exists(self.cursor_path):
                cx, cy = pyautogui.position()
                cursor = Image.open(self.cursor_path)
                cursor = cursor.resize(
                    (int(cursor.width / 1.5), int(cursor.height / 1.5)))
                img.paste(cursor, (cx, cy), cursor)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()


def make_handler(agent: GuestAgent):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            log.info("%s - %s", self.address_string(), fmt % args)

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.rstrip("/")
            if path == "/probe":
                self._json(200, {"status": "Probe successful",
                                 "message": "Service is operational"})
            elif path == "/screenshot":
                try:
                    png = agent.screenshot_png()
                except Exception as e:
                    log.exception("screenshot failed")
                    self._json(500, {"status": "error", "message": str(e)})
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
            else:
                self._json(404, {"status": "error", "message": "not found"})

        def do_POST(self):
            if self.path.rstrip("/") != "/execute":
                self._json(404, {"status": "error", "message": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                data = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._json(400, {"status": "error", "message": "bad JSON"})
                return
            if "command" not in data:
                self._json(400, {"status": "error",
                                 "message": "command is required"})
                return
            with agent.lock:
                code, payload = agent.execute(data)
            self._json(code, payload)

    return Handler


def serve(host: str, port: int, agent: GuestAgent) -> ThreadingHTTPServer:
    httpd = ThreadingHTTPServer((host, port), make_handler(agent))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd


def main(argv=None):
    ap = argparse.ArgumentParser("omnibox guest control server")
    # the reference binds the QEMU user-net guest address 10.0.2.15
    # (main.py:98); 0.0.0.0 also serves the samba/host-forwarded ports
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--log_file",
                    default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                         "server.log"))
    ap.add_argument("--allow-exec", action="store_true",
                    help="allow arbitrary commands (reference execute_anything; "
                         "testing only)")
    ap.add_argument("--cursor", default=None,
                    help="cursor image pasted into screenshots")
    args = ap.parse_args(argv)
    logging.basicConfig(filename=args.log_file, level=logging.DEBUG, filemode="w")
    agent = GuestAgent(allow_exec=args.allow_exec, cursor_path=args.cursor)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(agent))
    print(f"omnibox guest server on {args.host}:{args.port} "
          f"(allow_exec={args.allow_exec})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
