"""LLM chat clients over raw HTTP (no vendor SDKs in this image).

Pluggable provider registry with interleaved text/image content
(reference: omnitool/gradio/agent/llm_utils/oaiclient.py:7-62 and
groqclient.py:5-58), plus a deterministic MockLLM for CI.

Every client returns (text, token_usage_dict).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import requests

# per-1M-token pricing for cost accounting (reference vlm_agent.py:104-144)
PRICING_PER_M = {
    "gpt-4o": (2.5, 10.0),
    "gpt-4o-mini": (0.15, 0.6),
    "o1": (15.0, 60.0),
    "o3-mini": (1.1, 4.4),
    "claude-3-5-sonnet-20241022": (3.0, 15.0),
}


def estimate_cost(model: str, prompt_tokens: int, completion_tokens: int) -> float:
    pin, pout = PRICING_PER_M.get(model, (0.0, 0.0))
    return (prompt_tokens * pin + completion_tokens * pout) / 1e6


class OpenAICompatClient:
    """OpenAI-compatible /chat/completions with interleaved text+images.

    Handles the reference's provider quirks (oaiclient.py:23-45):
    o1/o3 use `reasoning_effort` + max_completion_tokens; o3-mini takes no
    images; dashscope/groq are the same wire format with other base URLs.
    """

    def __init__(self, model: str, api_key: Optional[str] = None,
                 base_url: str = "https://api.openai.com/v1", temperature: float = 0.7):
        self.model = model
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY", "")
        self.base_url = base_url.rstrip("/")
        self.temperature = temperature

    def __call__(self, messages: List[Dict], system: str,
                 max_tokens: int = 2048) -> Tuple[str, Dict]:
        content_msgs = [{"role": "system", "content": system}]
        for m in messages:
            content_msgs.append(self._convert(m))
        payload = {"model": self.model, "messages": content_msgs}
        if self.model.startswith(("o1", "o3")):
            payload["reasoning_effort"] = "medium"
            payload["max_completion_tokens"] = max_tokens
        else:
            payload["max_tokens"] = max_tokens
            payload["temperature"] = self.temperature
        resp = requests.post(
            f"{self.base_url}/chat/completions",
            headers={"Authorization": f"Bearer {self.api_key}"},
            json=payload, timeout=120,
        )
        if resp.status_code != 200:
            raise RuntimeError(f"LLM error [{resp.status_code}]: {resp.text[:300]}")
        data = resp.json()
        usage = data.get("usage", {})
        text = data["choices"][0]["message"]["content"]
        if "</think>" in text:  # R1-style reasoning strip (groqclient.py:40-47)
            text = text.split("</think>")[-1]
        return text, usage

    def _convert(self, m: Dict) -> Dict:
        no_images = self.model.startswith("o3-mini")
        if isinstance(m.get("content"), str):
            return {"role": m["role"], "content": m["content"]}
        parts = []
        for block in m["content"]:
            if block.get("type") == "text":
                parts.append({"type": "text", "text": block["text"]})
            elif block.get("type") == "image" and not no_images:
                b64 = block["source"]["data"]
                parts.append({"type": "image_url",
                              "image_url": {"url": f"data:image/png;base64,{b64}"}})
        return {"role": m["role"], "content": parts}


class AnthropicClient:
    """Anthropic /v1/messages with the computer-use beta
    (reference anthropic_agent.py:74-100), raw wire format."""

    def __init__(self, model: str, api_key: Optional[str] = None,
                 base_url: str = "https://api.anthropic.com"):
        self.model = model
        self.api_key = api_key or os.environ.get("ANTHROPIC_API_KEY", "")
        self.base_url = base_url.rstrip("/")

    def __call__(self, messages: List[Dict], system: str, tools: List[Dict],
                 max_tokens: int = 4096) -> Tuple[List[Dict], Dict]:
        resp = requests.post(
            f"{self.base_url}/v1/messages",
            headers={
                "x-api-key": self.api_key,
                "anthropic-version": "2023-06-01",
                "anthropic-beta": "computer-use-2024-10-22",
            },
            json={
                "model": self.model, "system": system, "messages": messages,
                "tools": tools, "max_tokens": max_tokens,
            },
            timeout=120,
        )
        if resp.status_code != 200:
            raise RuntimeError(f"Anthropic error [{resp.status_code}]: {resp.text[:300]}")
        data = resp.json()
        return data["content"], data.get("usage", {})


class MockLLM:
    """Deterministic scripted responses for CI; records prompts."""

    def __init__(self, responses: List[str]):
        self.responses = list(responses)
        self.calls: List[Dict] = []

    def __call__(self, messages, system, **kw) -> Tuple[str, Dict]:
        self.calls.append({"messages": messages, "system": system})
        text = self.responses.pop(0) if self.responses else json.dumps(
            {"Reasoning": "done", "Next Action": "None"}
        )
        return text, {"prompt_tokens": 10, "completion_tokens": 5}
