"""LLM task decomposition: free-form command -> CALVIN subtask sequence.

Counterpart of the reference's GPT-3 planner
(reference: hulc2/rollout/gpt3_planning.py:8-75): a few-shot prompt maps a
natural instruction to pseudo-API calls (pick_and_place / open_drawer / ...)
that resolve to CALVIN task instructions. The LLM backend is pluggable
(an OpenAI-compatible client when configured, else a deterministic keyword
planner so the pipeline works offline).
"""
from __future__ import annotations

import logging
import re
from typing import Callable, List, Optional

from hulc2_tpu.evaluation.tasks import COLORS, TASK_NAMES
from hulc2_tpu.tools.annotations import ANNOTATION_BANK

logger = logging.getLogger(__name__)

FEW_SHOT_PROMPT = """You control a tabletop robot. Decompose the user's command
into a sequence of calls from this API, one per line:
  open_drawer() close_drawer() move_slider_left() move_slider_right()
  turn_on_led() turn_off_led() turn_on_lightbulb() turn_off_lightbulb()
  lift(color, from) place_in(where) push(color, direction) rotate(color, direction)
  push_into_drawer() stack_block() unstack_block()

Command: tidy the red block into the drawer
Plan:
open_drawer()
lift(red, table)
place_in(drawer)
close_drawer()

Command: make the room bright
Plan:
turn_on_lightbulb()
turn_on_led()

Command: {command}
Plan:
"""

_API_TO_TASK = {
    "open_drawer": "open_drawer",
    "close_drawer": "close_drawer",
    "move_slider_left": "move_slider_left",
    "move_slider_right": "move_slider_right",
    "turn_on_led": "turn_on_led",
    "turn_off_led": "turn_off_led",
    "turn_on_lightbulb": "turn_on_lightbulb",
    "turn_off_lightbulb": "turn_off_lightbulb",
    "push_into_drawer": "push_into_drawer",
    "stack_block": "stack_block",
    "unstack_block": "unstack_block",
}


def parse_plan(text: str) -> List[str]:
    """LLM output lines -> CALVIN task names."""
    tasks: List[str] = []
    for line in text.strip().splitlines():
        m = re.match(r"\s*(\w+)\((.*?)\)", line)
        if not m:
            continue
        fn, raw_args = m.group(1), [a.strip().strip("'\"") for a in m.group(2).split(",") if a.strip()]
        if fn in _API_TO_TASK:
            tasks.append(_API_TO_TASK[fn])
        elif fn == "lift" and len(raw_args) == 2 and raw_args[0] in COLORS:
            tasks.append(f"lift_{raw_args[0]}_block_{raw_args[1]}")
        elif fn == "place_in" and raw_args:
            tasks.append(f"place_in_{raw_args[0]}")
        elif fn in ("push", "rotate") and len(raw_args) == 2 and raw_args[0] in COLORS:
            tasks.append(f"{fn}_{raw_args[0]}_block_{raw_args[1]}")
    return [t for t in tasks if t in TASK_NAMES]


def keyword_planner(command: str) -> str:
    """Deterministic offline fallback: match task names / annotation phrases."""
    cmd = command.lower()
    lines = []
    for task in TASK_NAMES:
        hit = task.replace("_", " ") in cmd or any(
            phrase in cmd for phrase in (a.lower() for a in ANNOTATION_BANK[task])
        )
        if hit:
            parts = task.split("_")
            if task.startswith("lift_"):
                lines.append(f"lift({parts[1]}, {parts[-1]})")
            elif task.startswith(("push_", "rotate_")) and parts[1] in COLORS:
                lines.append(f"{parts[0]}({parts[1]}, {parts[-1]})")
            elif task.startswith("place_in"):
                lines.append(f"place_in({parts[-1]})")
            else:
                lines.append(f"{task}()")
    return "\n".join(lines)


class LLMPlanner:
    def __init__(self, complete_fn: Optional[Callable[[str], str]] = None):
        """``complete_fn(prompt) -> text``; defaults to the keyword planner.
        Wire an OpenAI-compatible client like:
            planner = LLMPlanner(lambda p: client.completions.create(...).text)
        """
        self.complete_fn = complete_fn

    def plan(self, command: str) -> List[str]:
        if self.complete_fn is None:
            text = keyword_planner(command)
        else:
            text = self.complete_fn(FEW_SHOT_PROMPT.format(command=command))
        tasks = parse_plan(text)
        logger.info("plan for %r: %s", command, tasks)
        return tasks

    def instructions(self, command: str) -> List[str]:
        """Subtask sequence as natural-language instructions for the policy."""
        return [ANNOTATION_BANK[t][0] for t in self.plan(command)]
