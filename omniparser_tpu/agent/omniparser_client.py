"""Client tying the VM to the parse server (reference:
omnitool/gradio/agent/llm_utils/omniparserclient.py:9-44)."""

from __future__ import annotations

import base64
from typing import Dict, Optional

import requests

from omniparser_tpu.agent.tools.computer import ComputerTool


class OmniParserClient:
    """Screenshot the VM, POST to the parse server, reformat elements."""

    def __init__(self, server_url: str, computer: Optional[ComputerTool] = None):
        self.server_url = server_url.rstrip("/")
        self.computer = computer

    def probe(self) -> bool:
        try:
            return requests.get(f"{self.server_url}/probe/", timeout=5).status_code == 200
        except requests.RequestException:
            return False

    def parse_screenshot(self, screenshot_b64: Optional[str] = None) -> Dict:
        """Returns {'original_screenshot_base64', 'som_image_base64',
        'parsed_content_list', 'screen_info', 'latency'} — the shape the
        agents consume (omniparserclient.py:14-44)."""
        from omniparser_tpu.utils.retry import retry_call

        if screenshot_b64 is None:
            if self.computer is None:
                raise ValueError("no screenshot provided and no VM attached")
            screenshot_b64 = self.computer.get_screenshot()
        # parse is idempotent: retry transient server drops with backoff
        resp = retry_call(lambda: requests.post(
            f"{self.server_url}/parse/", json={"base64_image": screenshot_b64},
            timeout=300,
        ))
        resp.raise_for_status()
        data = resp.json()
        elements = data["parsed_content_list"]
        screen_info = "\n".join(
            f"ID: {i}, {'Text' if e['type'] == 'text' else 'Icon'}: {e['content']}"
            for i, e in enumerate(elements)
        )
        return {
            "original_screenshot_base64": screenshot_b64,
            "som_image_base64": data["som_image_base64"],
            "parsed_content_list": elements,
            "screen_info": screen_info,
            "latency": data.get("latency"),
        }
