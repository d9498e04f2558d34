"""Orchestrated VLM agent: plan generation + per-step progress ledger +
trajectory logging (reference:
omnitool/gradio/agent/vlm_agent_with_orchestrator.py:65-498).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, List, Optional

from omniparser_tpu.agent.vlm_agent import VLMAgent, parse_agent_response

PLAN_PROMPT = """You are planning a GUI automation task on a Windows device.
Task: {task}
Current screen elements:
{screen_info}

Produce a short numbered plan (3-8 steps) to accomplish the task. Output a ```json block:
```json
{{"plan": ["step 1...", "step 2..."]}}
```"""

# per-step re-evaluation, after the reference's ORCHESTRATOR_LEDGER_PROMPT
# (vlm_agent_with_orchestrator.py:22-54)
LEDGER_PROMPT = """Recent progress on the task: {task}
Plan: {plan}
Review the conversation so far and answer in a ```json block:
```json
{{
  "is_request_satisfied": {{"reason": "...", "answer": true/false}},
  "is_progress_being_made": {{"reason": "...", "answer": true/false}},
  "next_instruction": {{"reason": "...", "answer": "the next concrete sub-goal"}}
}}
```"""


class VLMOrchestratedAgent(VLMAgent):
    """VLMAgent + step-0 planning, ledger re-evaluation, and trajectory
    persistence (screenshots + trajectory.json lines with latencies)."""

    def __init__(self, *args, save_folder: Optional[str] = None, **kw):
        super().__init__(*args, **kw)
        self.save_folder = save_folder
        self.plan: List[str] = []
        self.ledger: Dict = {}
        self.step_count = 0
        if save_folder:
            os.makedirs(save_folder, exist_ok=True)

    def initialize_task(self, task: str, parsed_screen: Dict) -> List[str]:
        """Step-0 plan generation (_initialize_task, :378-407)."""
        text, _ = self.client(
            [{"role": "user", "content": PLAN_PROMPT.format(
                task=task, screen_info=parsed_screen["screen_info"])}],
            system="You are a precise planner.", max_tokens=self.max_tokens,
        )
        self.plan = parse_agent_response(text).get("plan", [])
        self._persist("plan.json", {"task": task, "plan": self.plan})
        return self.plan

    def update_ledger(self, task: str, messages: List[Dict]) -> Dict:
        """Progress re-evaluation before each action (_update_ledger, :409-426)."""
        text, _ = self.client(
            messages + [{"role": "user", "content": LEDGER_PROMPT.format(
                task=task, plan=json.dumps(self.plan))}],
            system="You evaluate progress.", max_tokens=self.max_tokens,
        )
        self.ledger = parse_agent_response(text)
        return self.ledger

    def __call__(self, messages: List[Dict], parsed_screen: Dict, task: str):
        t0 = time.perf_counter()
        if not self.plan:
            self.initialize_task(task, parsed_screen)
        if self.step_count > 0:
            self.update_ledger(task, messages)
        sub_goal = (
            self.ledger.get("next_instruction", {}).get("answer") if self.ledger else None
        )
        effective_task = f"{task}\nCurrent sub-goal: {sub_goal}" if sub_goal else task
        assistant, action = super().__call__(messages, parsed_screen, effective_task)
        latency = time.perf_counter() - t0

        # trajectory line + screenshot + parsed elements (reference
        # :129-133, :273-285 — the reference persists these "for training
        # data pipelines"; train/trajectory_data.py consumes them)
        self._persist_screenshot(parsed_screen, self.step_count)
        self._persist(
            f"step{self.step_count}_elements.json",
            parsed_screen.get("parsed_content_list", []),
        )
        self._append_trajectory(
            {
                "step": self.step_count,
                "action": action,
                "ledger": self.ledger,
                "latency_s": latency,
            }
        )
        self.step_count += 1
        return assistant, action

    # ------------------------------------------------------------ #

    def _persist(self, name: str, payload: Dict):
        if self.save_folder:
            with open(os.path.join(self.save_folder, name), "w") as f:
                json.dump(payload, f, indent=2)

    def _append_trajectory(self, line: Dict):
        if self.save_folder:
            with open(os.path.join(self.save_folder, "trajectory.json"), "a") as f:
                f.write(json.dumps(line) + "\n")

    def _persist_screenshot(self, parsed_screen: Dict, step: int):
        if self.save_folder:
            import base64

            for key, suffix in (("original_screenshot_base64", "raw"),
                                ("som_image_base64", "som")):
                if parsed_screen.get(key):
                    with open(os.path.join(self.save_folder,
                                           f"step{step}_{suffix}.png"), "wb") as f:
                        f.write(base64.b64decode(parsed_screen[key]))
