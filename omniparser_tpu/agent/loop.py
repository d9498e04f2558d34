"""The agent sampling loop (reference: omnitool/gradio/loop.py:26-127).

Each turn: screenshot+parse via OmniParserClient -> actor chooses actions
-> executor runs them in the VM -> repeat until the actor emits no action
or max_turns is hit.  Actor selection by model string mirrors loop.py:59-91.
"""

from __future__ import annotations

import enum
from typing import Callable, Dict, Generator, List, Optional

from omniparser_tpu.agent.executor import Executor
from omniparser_tpu.agent.omniparser_client import OmniParserClient
from omniparser_tpu.agent.tools.computer import ComputerTool, ToolCollection
from omniparser_tpu.agent.vlm_agent import VLMAgent
from omniparser_tpu.agent.orchestrator import VLMOrchestratedAgent


class APIProvider(str, enum.Enum):
    ANTHROPIC = "anthropic"
    OPENAI = "openai"
    GROQ = "groq"
    DASHSCOPE = "dashscope"
    MOCK = "mock"


OMNIPARSER_MODELS = {
    "omniparser + gpt-4o", "omniparser + o1", "omniparser + o3-mini",
    "omniparser + R1", "omniparser + qwen2.5vl",
}


def make_actor(model: str, provider: str, client: Callable,
               screen_wh=(1920, 1080), save_folder: Optional[str] = None,
               tool_params=None):
    """Model-string actor dispatch (loop.py:59-91)."""
    if model.startswith("claude"):
        from omniparser_tpu.agent.anthropic_agent import AnthropicActor

        # client must speak the Anthropic shape: (messages, system, tools,
        # max_tokens) -> (content blocks, usage); None -> real API client
        return AnthropicActor(model=model, client=client, tool_params=tool_params)
    orchestrated = model.endswith("-orchestrated")
    base = model.removesuffix("-orchestrated")
    if base in OMNIPARSER_MODELS or provider == APIProvider.MOCK:
        cls = VLMOrchestratedAgent if orchestrated else VLMAgent
        kw = {"save_folder": save_folder} if orchestrated else {}
        return cls(model=base, client=client, screen_wh=screen_wh, **kw)
    raise ValueError(f"unsupported model {model!r}")


def sampling_loop_sync(
    *,
    task: str,
    model: str,
    provider: str,
    llm_client: Callable,
    omniparser_url: str,
    vm_url: str,
    max_turns: int = 10,
    save_folder: Optional[str] = None,
    output_callback: Optional[Callable] = None,
) -> Generator[Dict, None, List[Dict]]:
    """Yields per-turn state dicts; returns the full message history."""
    computer = ComputerTool(vm_url, settle_s=0.0)
    tools = ToolCollection(computer)
    is_anthropic = model.startswith("claude")
    parser_client = None if is_anthropic else OmniParserClient(omniparser_url, computer)
    actor = make_actor(model, provider, llm_client,
                       screen_wh=computer.screen_size(), save_folder=save_folder,
                       tool_params=tools.to_params())
    executor = Executor(tools, output_callback)

    messages: List[Dict] = [{"role": "user", "content": task}]
    for turn in range(max_turns):
        if is_anthropic:
            # Claude computer-use sees the screen through the tool itself
            # (reference loop.py: the anthropic branch skips the parser)
            parsed, action = None, None
            assistant = actor(messages)
        else:
            parsed = parser_client.parse_screenshot()
            assistant, action = actor(messages, parsed, task)
        results = executor(assistant, messages)
        yield {
            "turn": turn,
            "parsed_screen": parsed,
            "assistant": assistant,
            "action": action,
            "tool_results": results,
        }
        if not any(b.get("type") == "tool_use" for b in assistant["content"]):
            break
    return messages
