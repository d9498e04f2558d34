"""Executor: run each tool_use block in an assistant message and convert
results to tool_result blocks (reference:
omnitool/gradio/executor/anthropic_executor.py:18-132)."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

from omniparser_tpu.agent.tools.computer import ToolCollection, ToolResult


def tool_result_to_block(result: ToolResult, tool_use_id: str) -> Dict:
    content = []
    if result.error:
        return {"type": "tool_result", "tool_use_id": tool_use_id,
                "is_error": True, "content": [{"type": "text", "text": result.error}]}
    if result.output:
        content.append({"type": "text", "text": result.output})
    if result.base64_image:
        content.append({"type": "image",
                        "source": {"type": "base64", "media_type": "image/png",
                                   "data": result.base64_image}})
    return {"type": "tool_result", "tool_use_id": tool_use_id, "content": content}


class Executor:
    def __init__(self, tools: ToolCollection,
                 output_callback: Optional[Callable] = None):
        self.tools = tools
        self.output_callback = output_callback or (lambda *a, **k: None)

    def __call__(self, assistant_message: Dict, messages: List[Dict]) -> List[Dict]:
        """Append the assistant message, run its tool calls, append one user
        message with the tool results.  Returns the result blocks."""
        messages.append(assistant_message)
        result_blocks = []
        for block in assistant_message.get("content", []):
            if block.get("type") != "tool_use":
                self.output_callback(block)
                continue
            result = self.tools.run(name=block["name"], tool_input=block.get("input", {}))
            result_blocks.append(tool_result_to_block(result, block["id"]))
            self.output_callback(result_blocks[-1])
        if result_blocks:
            messages.append({"role": "user", "content": result_blocks})
        return result_blocks
