"""Anthropic computer-use actor (reference:
omnitool/gradio/agent/anthropic_agent.py:47-162): direct Claude
computer-use over the raw /v1/messages wire format with the
computer-use-2024-10-22 beta, plus cache-friendly image pruning.
"""

from __future__ import annotations

from typing import Dict, List

from omniparser_tpu.agent.llm import AnthropicClient

SYSTEM_PROMPT = (
    "You are utilising a Windows machine with internet access. "
    "Use the computer tool to accomplish the user's task. "
    "After each action, a screenshot is returned; verify the effect before "
    "the next action."
)


def prune_images(messages: List[Dict], keep_n: int) -> List[Dict]:
    """Strip all but the newest keep_n screenshots from tool_result blocks
    (anthropic_agent.py:116-162; chunked so prompt caching stays useful)."""
    seen = 0
    out = []
    for m in reversed(messages):
        content = m.get("content")
        if isinstance(content, list):
            new_blocks = []
            for b in reversed(content):
                if b.get("type") == "tool_result":
                    inner = []
                    for c in reversed(b.get("content", [])):
                        if c.get("type") == "image":
                            seen += 1
                            if seen > keep_n:
                                continue
                        inner.append(c)
                    b = {**b, "content": list(reversed(inner))}
                new_blocks.append(b)
            m = {**m, "content": list(reversed(new_blocks))}
        out.append(m)
    return list(reversed(out))


class AnthropicActor:
    def __init__(self, model: str = "claude-3-5-sonnet-20241022",
                 client: AnthropicClient | None = None, tool_params: List[Dict] = None,
                 max_tokens: int = 4096, only_n_most_recent_images: int = 2,
                 provider: str = "anthropic"):
        from omniparser_tpu.agent.llm import make_anthropic_client

        self.model = model
        # provider switch per the reference (anthropic_agent.py:74-79):
        # 'anthropic' | 'bedrock' | 'vertex'
        self.client = client or make_anthropic_client(provider, model)
        self.tool_params = tool_params or []
        self.max_tokens = max_tokens
        self.only_n = only_n_most_recent_images

    def __call__(self, messages: List[Dict]) -> Dict:
        pruned = prune_images(messages, self.only_n)
        content, usage = self.client(
            pruned, SYSTEM_PROMPT, self.tool_params, max_tokens=self.max_tokens
        )
        return {"role": "assistant", "content": content, "usage": usage}
