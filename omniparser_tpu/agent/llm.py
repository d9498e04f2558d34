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


class BedrockAnthropicClient:
    """Claude on AWS Bedrock (reference anthropic_agent.py:76-77 uses
    AnthropicBedrock): raw bedrock-runtime InvokeModel with stdlib SigV4
    signing (boto3 is not in this image)."""

    def __init__(self, model: str, region: Optional[str] = None,
                 access_key: Optional[str] = None, secret_key: Optional[str] = None,
                 session_token: Optional[str] = None):
        self.model = model
        self.region = region or os.environ.get("AWS_REGION", "us-west-2")
        self.access_key = access_key or os.environ.get("AWS_ACCESS_KEY_ID", "")
        self.secret_key = secret_key or os.environ.get("AWS_SECRET_ACCESS_KEY", "")
        self.session_token = session_token or os.environ.get("AWS_SESSION_TOKEN")

    def _sign(self, host: str, path: str, body: bytes) -> Dict[str, str]:
        """AWS Signature Version 4 for bedrock InvokeModel (service
        'bedrock'), stdlib only."""
        import datetime
        import hashlib
        import hmac

        now = datetime.datetime.now(datetime.timezone.utc)
        amz_date = now.strftime("%Y%m%dT%H%M%SZ")
        datestamp = now.strftime("%Y%m%d")
        service = "bedrock"
        payload_hash = hashlib.sha256(body).hexdigest()
        headers = {
            "content-type": "application/json",
            "host": host,
            "x-amz-date": amz_date,
        }
        if self.session_token:
            headers["x-amz-security-token"] = self.session_token
        signed = ";".join(sorted(headers))
        canonical = "\n".join([
            "POST", path, "",
            "".join(f"{k}:{headers[k]}\n" for k in sorted(headers)),
            signed, payload_hash,
        ])
        scope = f"{datestamp}/{self.region}/{service}/aws4_request"
        to_sign = "\n".join([
            "AWS4-HMAC-SHA256", amz_date, scope,
            hashlib.sha256(canonical.encode()).hexdigest(),
        ])

        def hkey(key, msg):
            return hmac.new(key, msg.encode(), hashlib.sha256).digest()

        k = hkey(("AWS4" + self.secret_key).encode(), datestamp)
        k = hkey(k, self.region)
        k = hkey(k, service)
        k = hkey(k, "aws4_request")
        sig = hmac.new(k, to_sign.encode(), hashlib.sha256).hexdigest()
        headers["authorization"] = (
            f"AWS4-HMAC-SHA256 Credential={self.access_key}/{scope}, "
            f"SignedHeaders={signed}, Signature={sig}"
        )
        return headers

    def __call__(self, messages: List[Dict], system: str, tools: List[Dict],
                 max_tokens: int = 4096) -> Tuple[List[Dict], Dict]:
        import urllib.parse

        host = f"bedrock-runtime.{self.region}.amazonaws.com"
        path = f"/model/{urllib.parse.quote(self.model, safe='')}/invoke"
        body = json.dumps({
            "anthropic_version": "bedrock-2023-05-31",
            "system": system, "messages": messages, "tools": tools,
            "max_tokens": max_tokens,
            "anthropic_beta": ["computer-use-2024-10-22"],
        }).encode()
        resp = requests.post(f"https://{host}{path}", data=body,
                             headers=self._sign(host, path, body), timeout=120)
        if resp.status_code != 200:
            raise RuntimeError(f"Bedrock error [{resp.status_code}]: {resp.text[:300]}")
        data = resp.json()
        return data["content"], data.get("usage", {})


class VertexAnthropicClient:
    """Claude on GCP Vertex AI (reference anthropic_agent.py:78-79 uses
    AnthropicVertex): rawPredict with a bearer token from
    GOOGLE_ACCESS_TOKEN (no gcloud SDK in this image)."""

    def __init__(self, model: str, project: Optional[str] = None,
                 region: Optional[str] = None, access_token: Optional[str] = None):
        self.model = model
        self.project = project or os.environ.get("GOOGLE_CLOUD_PROJECT", "")
        self.region = region or os.environ.get("CLOUD_ML_REGION", "us-east5")
        self.access_token = access_token or os.environ.get("GOOGLE_ACCESS_TOKEN", "")

    def __call__(self, messages: List[Dict], system: str, tools: List[Dict],
                 max_tokens: int = 4096) -> Tuple[List[Dict], Dict]:
        url = (
            f"https://{self.region}-aiplatform.googleapis.com/v1/projects/"
            f"{self.project}/locations/{self.region}/publishers/anthropic/"
            f"models/{self.model}:rawPredict"
        )
        resp = requests.post(
            url,
            headers={"Authorization": f"Bearer {self.access_token}",
                     "Content-Type": "application/json"},
            json={
                "anthropic_version": "vertex-2023-10-16",
                "system": system, "messages": messages, "tools": tools,
                "max_tokens": max_tokens,
            },
            timeout=120,
        )
        if resp.status_code != 200:
            raise RuntimeError(f"Vertex error [{resp.status_code}]: {resp.text[:300]}")
        data = resp.json()
        return data["content"], data.get("usage", {})


def make_anthropic_client(provider: str, model: str, **kw):
    """Provider selection mirroring the reference's APIProvider switch
    (anthropic_agent.py:74-79): 'anthropic' | 'bedrock' | 'vertex'."""
    if provider == "anthropic":
        return AnthropicClient(model, **kw)
    if provider == "bedrock":
        return BedrockAnthropicClient(model, **kw)
    if provider == "vertex":
        return VertexAnthropicClient(model, **kw)
    raise ValueError(f"unknown Anthropic provider {provider!r}")


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
