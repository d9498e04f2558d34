"""VLM agent: SOM-grounded action selection via a text+vision LLM.

Reference: omnitool/gradio/agent/vlm_agent.py:30-353 — builds a system
prompt embedding the parsed element list, expects a ```json fenced response
{Reasoning, Next Action, Box ID?, value?}, converts Box ID -> bbox centroid
pixel coords, and emits tool_use blocks (mouse_move + the action).
"""

from __future__ import annotations

import json
import re
import uuid
from typing import Callable, Dict, List, Optional, Tuple

from omniparser_tpu.agent.llm import estimate_cost

# Same 8-action contract as the reference agent (vlm_agent.py:222-230);
# wording is ours, the semantics the executor implements are identical.
ACTION_SPACE = """
1. type: enter a text string with the keyboard.
2. left_click: move the cursor to the chosen Box ID, then click the left button.
3. right_click: move the cursor to the chosen Box ID, then click the right button.
4. double_click: move the cursor to the chosen Box ID, then click the left button twice.
5. hover: only move the cursor to the chosen Box ID.
6. scroll_up: scroll the page upward toward earlier content.
7. scroll_down: scroll the page downward toward later content.
8. wait: pause one second so the device can finish loading or responding.
""".strip()


def build_system_prompt(task: str, screen_info: str) -> str:
    """The SOM grounding prompt (structure per vlm_agent.py:210-294)."""
    return f"""You are using a Windows device. You can only interact with the screen through the actions below.
Here is the list of all detected bounding boxes by IDs on the screen and their description:
{screen_info}

Your available "Next Action" only include:
{ACTION_SPACE}

Based on the visual information of the screenshot and the detected bounding boxes, decide the single next action to accomplish the task: {task}

Output format — a single ```json block:
```json
{{
    "Reasoning": "why this action",
    "Next Action": "action_type" or "None" when the task is finished,
    "Box ID": <id, when the action targets a box>,
    "value": "text to type, only for the type action"
}}
```
One action at a time. Box ID must come from the list above."""


def parse_agent_response(text: str) -> Dict:
    """Extract the fenced json (tolerant of bare json)."""
    m = re.search(r"```(?:json)?\s*(\{.*?\})\s*```", text, re.DOTALL)
    raw = m.group(1) if m else text[text.find("{"): text.rfind("}") + 1]
    return json.loads(raw)


def box_id_to_coords(
    box_id: int, elements: List[Dict], screen_wh: Tuple[int, int]
) -> Tuple[int, int]:
    """Box ID -> centroid pixels (vlm_agent.py:150-153; bboxes are ratio xyxy).
    Raises ValueError on hallucinated / out-of-range ids (callers degrade
    gracefully, like the reference's try/except around the conversion)."""
    idx = int(box_id)
    if not 0 <= idx < len(elements):
        raise ValueError(f"Box ID {box_id} out of range (0..{len(elements) - 1})")
    bbox = elements[idx]["bbox"]
    w, h = screen_wh
    return int((bbox[0] + bbox[2]) / 2 * w), int((bbox[1] + bbox[3]) / 2 * h)


def make_tool_use_blocks(action: Dict, elements: List[Dict],
                         screen_wh: Tuple[int, int]) -> List[Dict]:
    """Synthesize tool_use content blocks (mouse_move + action), matching
    the reference's BetaToolUseBlock emission (vlm_agent.py:184-204).
    Invalid/hallucinated Box IDs degrade to no action (reference wraps the
    conversion in try/except and continues)."""
    next_action = action.get("Next Action")
    if next_action in (None, "None", ""):
        return []
    blocks = []

    def block(tool_input):
        return {"type": "tool_use", "id": f"toolu_{uuid.uuid4().hex[:12]}",
                "name": "computer", "input": tool_input}

    coords = None
    if action.get("Box ID") is not None:
        try:
            coords = box_id_to_coords(action["Box ID"], elements, screen_wh)
        except (ValueError, TypeError, KeyError):
            coords = None

    if coords is not None:
        # the reference emits mouse_move before every action incl. type
        # (vlm_agent.py:184-190); the tool's click variants click in place
        blocks.append(block({"action": "mouse_move", "coordinate": list(coords)}))
    elif action.get("Box ID") is not None and next_action not in ("scroll_up", "scroll_down", "wait"):
        # targeted action with an unusable target: skip rather than misfire
        return []
    if next_action == "type":
        blocks.append(block({"action": "type", "text": action.get("value", "")}))
    else:
        blocks.append(block({"action": next_action}))
    return blocks


class VLMAgent:
    """One agent turn: (messages, parsed_screen) -> assistant content blocks."""

    def __init__(self, model: str, client: Callable, screen_wh=(1920, 1080),
                 max_images: int = 2, max_tokens: int = 2048):
        self.model = model
        self.client = client
        self.screen_wh = screen_wh
        self.max_images = max_images
        self.max_tokens = max_tokens
        self.total_tokens = 0
        self.total_cost = 0.0

    def __call__(self, messages: List[Dict], parsed_screen: Dict, task: str):
        system = build_system_prompt(task, parsed_screen["screen_info"])
        history = self._prune_images(list(messages))
        history.append(
            {
                "role": "user",
                "content": [
                    {"type": "text", "text": "Screenshot with bounding boxes:"},
                    {"type": "image",
                     "source": {"type": "base64", "media_type": "image/png",
                                "data": parsed_screen["som_image_base64"]}},
                ],
            }
        )
        text, usage = self.client(history, system, max_tokens=self.max_tokens)
        self.total_tokens += usage.get("prompt_tokens", 0) + usage.get("completion_tokens", 0)
        self.total_cost += estimate_cost(
            self.model, usage.get("prompt_tokens", 0), usage.get("completion_tokens", 0)
        )

        action = parse_agent_response(text)
        blocks = [{"type": "text", "text": action.get("Reasoning", text)}]
        blocks += make_tool_use_blocks(
            action, parsed_screen["parsed_content_list"], self.screen_wh
        )
        return {"role": "assistant", "content": blocks}, action

    def _prune_images(self, messages: List[Dict]) -> List[Dict]:
        """Keep only the newest max_images-1 screenshots in the history
        (the fresh SOM screenshot appended after pruning makes max_images
        total — vlm_agent.py:296-353).  Pruned images become text stubs so
        no message is left with empty content (APIs reject those)."""
        budget = max(self.max_images - 1, 0)
        seen = 0
        out = []
        for m in reversed(messages):
            content = m.get("content")
            if isinstance(content, list):
                kept = []
                for b in reversed(content):
                    if b.get("type") == "image":
                        seen += 1
                        if seen > budget:
                            kept.append({"type": "text", "text": "(screenshot pruned)"})
                            continue
                    kept.append(b)
                m = {**m, "content": list(reversed(kept))}
            out.append(m)
        return list(reversed(out))
