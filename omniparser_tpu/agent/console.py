"""Zero-dependency agent chat console.

The TPU build's equivalent of the reference's gradio chat app
(omnitool/gradio/app.py:1-426): a browser UI that takes a task, drives
`sampling_loop_sync` (screenshot -> parse -> LLM -> VM action per turn),
and streams each turn's reasoning, action, and SOM screenshot back to the
page.  gradio isn't in this image; the UI is one embedded HTML page over a
stdlib ThreadingHTTPServer, same shape as serving/http.py's demo.

Mirrored behaviors:
  * model dropdown + provider/API-key settings (app.py:96-164)
  * pre-run /probe validation of BOTH servers (app.py:189-208)
  * stop button ending the run between turns (app.py:318-325)
  * per-turn chat log of reasoning / action / screenshot (app.py:235-316)

Endpoints: GET / (page), POST /run, GET /state?sid=, POST /stop,
GET /probe/.
"""

from __future__ import annotations

import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import requests

MODELS = [
    "omniparser + gpt-4o", "omniparser + o1", "omniparser + o3-mini",
    "omniparser + R1", "omniparser + qwen2.5vl",
    "omniparser + gpt-4o-orchestrated",
    "claude-3-5-sonnet-20241022",
    "mock",
]

PROVIDER_BASE_URLS = {
    "openai": "https://api.openai.com/v1",
    "groq": "https://api.groq.com/openai/v1",
    "dashscope": "https://dashscope.aliyuncs.com/compatible-mode/v1",
}


def make_llm_client(model: str, provider: str, api_key: str = "",
                    base_url: str = ""):
    """Provider -> callable the actors accept (reference loop.py:59-91
    passes api keys into each agent; we build the client up front)."""
    from omniparser_tpu.agent.llm import MockLLM, OpenAICompatClient

    if provider == "mock" or model == "mock":
        return MockLLM([])
    if model.startswith("claude"):
        return None  # AnthropicActor builds its own client from env/provider
    api_model = model.removeprefix("omniparser + ").removesuffix("-orchestrated")
    if api_model == "R1":
        api_model, provider = "deepseek-r1-distill-llama-70b", provider or "groq"
    if api_model == "qwen2.5vl":
        api_model, provider = "qwen2.5-vl-72b-instruct", provider or "dashscope"
    url = base_url or PROVIDER_BASE_URLS.get(provider or "openai",
                                             PROVIDER_BASE_URLS["openai"])
    return OpenAICompatClient(api_model, api_key=api_key, base_url=url)


class AgentSession:
    """One task run: a thread iterating sampling_loop_sync, collecting
    per-turn events the page polls for."""

    def __init__(self, task: str, model: str, provider: str,
                 omniparser_url: str, vm_url: str, llm_client=None,
                 max_turns: int = 10):
        self.sid = uuid.uuid4().hex[:12]
        self.task = task
        self.events: List[Dict] = []
        self.done = False
        self.error: Optional[str] = None
        self._stop = threading.Event()
        self._lock = threading.Lock()

        from omniparser_tpu.agent.loop import sampling_loop_sync

        def run():
            try:
                gen = sampling_loop_sync(
                    task=task, model=model, provider=provider,
                    llm_client=llm_client, omniparser_url=omniparser_url,
                    vm_url=vm_url, max_turns=max_turns,
                )
                for turn in gen:
                    with self._lock:
                        self.events.append(self._format(turn))
                    if self._stop.is_set():
                        break
            except Exception as e:  # noqa: BLE001 — surface to the page
                self.error = f"{type(e).__name__}: {e}"
            finally:
                self.done = True

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    @staticmethod
    def _format(turn: Dict) -> Dict:
        texts = [b.get("text", "") for b in turn["assistant"]["content"]
                 if b.get("type") == "text"]
        tools = [{"name": b.get("name"), "input": b.get("input")}
                 for b in turn["assistant"]["content"]
                 if b.get("type") == "tool_use"]
        parsed = turn.get("parsed_screen") or {}
        return {
            "turn": turn["turn"],
            "reasoning": "\n".join(t for t in texts if t),
            "actions": tools,
            "som_image_base64": parsed.get("som_image_base64"),
            "n_elements": len(parsed.get("parsed_content_list", []) or []),
            "latency": parsed.get("latency"),
        }

    def state(self) -> Dict:
        with self._lock:
            return {"sid": self.sid, "events": list(self.events),
                    "done": self.done, "error": self.error}

    def stop(self):
        self._stop.set()


def _probe(url: str) -> bool:
    try:
        return requests.get(f"{url.rstrip('/')}/probe/", timeout=5).status_code == 200
    except requests.RequestException:
        return False


PAGE = """<!doctype html><html><head><title>omniparser_tpu agent</title>
<style>body{font-family:sans-serif;max-width:1100px;margin:2em auto}
input,select{margin:2px;padding:4px}#log{margin-top:1em}
.turn{border:1px solid #ddd;border-radius:6px;padding:10px;margin:8px 0}
.turn img{max-width:100%;border:1px solid #ccc;margin-top:6px}
.act{font-family:monospace;background:#f4f4f4;padding:4px;display:block}
#err{color:#b00}</style></head><body>
<h2>omniparser_tpu agent console</h2>
<div>
 <input id=task size=60 placeholder="task, e.g. Open the browser and search...">
 <select id=model></select>
 <select id=provider><option>mock</option><option>openai</option>
   <option>groq</option><option>dashscope</option></select>
 <input id=key size=24 placeholder="API key" type=password>
 <button id=go>Run</button> <button id=stop disabled>Stop</button>
 <span id=st></span>
</div>
<div id=err></div><div id=log></div>
<script>
const MODELS = %MODELS%;
const sel = document.getElementById('model');
MODELS.forEach(m => { const o = document.createElement('option');
  o.textContent = m; sel.appendChild(o); });
let sid = null, timer = null, shown = 0;
const el = id => document.getElementById(id);
el('go').onclick = async () => {
  el('err').textContent = ''; el('log').innerHTML = ''; shown = 0;
  const resp = await fetch('/run', {method:'POST', body: JSON.stringify({
    task: el('task').value, model: sel.value,
    provider: el('provider').value, api_key: el('key').value})});
  const data = await resp.json();
  if (!resp.ok) { el('err').textContent = data.error; return; }
  sid = data.sid; el('go').disabled = true; el('stop').disabled = false;
  el('st').textContent = 'running...';
  timer = setInterval(poll, 800);
};
el('stop').onclick = async () => { await fetch('/stop', {method:'POST',
  body: JSON.stringify({sid})}); };
async function poll() {
  const data = await (await fetch('/state?sid=' + sid)).json();
  for (; shown < data.events.length; shown++) {
    const e = data.events[shown];
    const d = document.createElement('div'); d.className = 'turn';
    d.innerHTML = `<b>turn ${e.turn}</b> — ${e.n_elements} elements` +
      (e.latency ? ` (parse ${e.latency.toFixed(2)}s)` : '') +
      `<div>${e.reasoning || ''}</div>` +
      e.actions.map(a => `<span class=act>${a.name}(${JSON.stringify(a.input)})</span>`).join('') +
      (e.som_image_base64 ? `<img src="data:image/png;base64,${e.som_image_base64}">` : '');
    el('log').appendChild(d);
  }
  if (data.error) el('err').textContent = data.error;
  if (data.done) { clearInterval(timer); el('go').disabled = false;
    el('stop').disabled = true; el('st').textContent = 'done'; }
}
</script></body></html>"""


class AgentConsole:
    def __init__(self, omniparser_url: str, vm_url: str,
                 llm_client_factory=make_llm_client, max_turns: int = 10):
        self.omniparser_url = omniparser_url
        self.vm_url = vm_url
        self.llm_client_factory = llm_client_factory
        self.max_turns = max_turns
        self.sessions: Dict[str, AgentSession] = {}
        self._httpd: Optional[ThreadingHTTPServer] = None

    def start_session(self, task: str, model: str, provider: str,
                      api_key: str = "", base_url: str = "") -> AgentSession:
        # pre-run probe validation, like app.py:189-208
        if not _probe(self.omniparser_url):
            raise ConnectionError(f"omniparser server not ready at {self.omniparser_url}")
        if not _probe(self.vm_url):
            raise ConnectionError(f"VM not ready at {self.vm_url}")
        llm = self.llm_client_factory(model, provider, api_key, base_url)
        sess = AgentSession(task, model, "mock" if model == "mock" else provider,
                            self.omniparser_url, self.vm_url, llm_client=llm,
                            max_turns=self.max_turns)
        self.sessions[sess.sid] = sess
        return sess

    # ------------------------------------------------------------------ #

    def make_handler(self):
        console = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):
                pass

            def _send(self, code: int, payload, ctype="application/json"):
                body = (payload if isinstance(payload, bytes)
                        else json.dumps(payload).encode())
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path, _, query = self.path.partition("?")
                if path in ("/", "/demo"):
                    page = PAGE.replace("%MODELS%", json.dumps(MODELS))
                    self._send(200, page.encode(), "text/html")
                elif path.rstrip("/") == "/probe":
                    self._send(200, {"message": "agent console ready"})
                elif path.rstrip("/") == "/state":
                    sid = dict(p.split("=", 1) for p in query.split("&") if "=" in p
                               ).get("sid", "")
                    sess = console.sessions.get(sid)
                    if sess is None:
                        self._send(404, {"error": f"unknown session {sid!r}"})
                    else:
                        self._send(200, sess.state())
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                try:
                    data = json.loads(self.rfile.read(length) or b"{}")
                except json.JSONDecodeError as e:
                    self._send(400, {"error": f"bad json: {e}"})
                    return
                if self.path.rstrip("/") == "/run":
                    try:
                        sess = console.start_session(
                            task=data.get("task", ""), model=data.get("model", "mock"),
                            provider=data.get("provider", "mock"),
                            api_key=data.get("api_key", ""),
                            base_url=data.get("base_url", ""))
                        self._send(200, {"sid": sess.sid})
                    except (ConnectionError, ValueError) as e:
                        self._send(400, {"error": str(e)})
                elif self.path.rstrip("/") == "/stop":
                    sess = console.sessions.get(data.get("sid", ""))
                    if sess is None:
                        self._send(404, {"error": "unknown session"})
                    else:
                        sess.stop()
                        self._send(200, {"stopped": True})
                else:
                    self._send(404, {"error": "not found"})

        return Handler

    def serve_forever(self, host="127.0.0.1", port=7861):
        self._httpd = ThreadingHTTPServer((host, port), self.make_handler())
        print(f"agent console on {host}:{self._httpd.server_address[1]}")
        self._httpd.serve_forever()

    def shutdown(self):
        if self._httpd:
            self._httpd.shutdown()


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser("omniparser_tpu agent console")
    ap.add_argument("--omniparser_server_url", default="http://127.0.0.1:8000",
                    help="parse server (serving/http.py)")
    ap.add_argument("--vm_url", default="http://127.0.0.1:5000",
                    help="OmniBox guest control server (or mock_vm)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7861)
    ap.add_argument("--max_turns", type=int, default=10)
    args = ap.parse_args(argv)
    AgentConsole(args.omniparser_server_url, args.vm_url,
                 max_turns=args.max_turns).serve_forever(args.host, args.port)


if __name__ == "__main__":
    main()
