"""Request trace: the step/phase graph of an execution.

The reference BFS-walks its invocation relationship trees and renders
Graphviz (mr/trace.py:63-334, served at GET /request/<wf>/<id>). Spark
tracks the physical DAG itself (Spark UI / ``df.explain``); what we keep
is the *logical* step graph — which steps ran, at which fan-out depth,
in which phase — recorded driver-side at zero data cost, with an
optional DOT rendering for visual parity.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class TraceEvent:
    depth: int
    step_name: str
    phase: str  # 'map' | 'fanout→<step>' | 'fold'
    ts: float


@dataclass
class RequestTrace:
    events: list[TraceEvent] = field(default_factory=list)

    def record(self, depth: int, step_name: str, phase: str) -> None:
        self.events.append(TraceEvent(depth, step_name, phase, time.time()))

    def edges(self) -> list[tuple[str, str]]:
        """(parent_step, child_step) fan-out edges."""
        out = []
        for ev in self.events:
            if ev.phase.startswith("fanout→"):
                out.append((ev.step_name, ev.phase.split("→", 1)[1]))
        return sorted(set(out))

    def step_sequence(self) -> list[str]:
        seen, seq = set(), []
        for ev in self.events:
            if ev.phase == "map" and (ev.depth, ev.step_name) not in seen:
                seen.add((ev.depth, ev.step_name))
                seq.append(ev.step_name)
        return seq

    def to_dot(self) -> str:
        lines = ["digraph request {"]
        for step in self.step_sequence():
            lines.append(f'  "{step}";')
        for a, b in self.edges():
            lines.append(f'  "{a}" -> "{b}";')
        lines.append("}")
        return "\n".join(lines)

    def render_text(self) -> str:
        return "\n".join(
            f"{'  ' * ev.depth}{ev.step_name} [{ev.phase}]" for ev in self.events
        )
