"""Runtime observability frontends for the per-frame ``elements`` stream.

The reference renders a VisPy 2x2 GUI — 3D skeleton, action score bars with
few-shot coloring, open-set bar, focus "eye", FPS, distance, camera image +
bboxes, keyboard console (reference utils/output.py:8-280) — plus a
matplotlib 3D pose debugger (utils/matplotlib_visualizer.py:5-58). This
module provides the headless equivalents:

- :class:`ConsoleVisualizer` — renders each elements dict as a status line
  + score bars on the terminal (the observability contract: actions,
  open-set score, focus flag, FPS, distance, log).
- :class:`MPLPosePrinter` — matplotlib 3D skeleton viewer with the
  reference's print_pose/clear/sleep/save API.
- :class:`ElementsRecorder` — appends the stream to disk (npz) for offline
  inspection and benches.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Any, Dict, List, Optional

import numpy as np


def score_bar(value: float, width: int = 20) -> str:
    filled = int(max(0.0, min(1.0, value)) * width)
    return "#" * filled + "-" * (width - filled)


class ConsoleVisualizer:
    def __init__(self, stream=None):
        self.stream = stream or sys.stdout

    def show(self, elements: Dict[str, Any]) -> None:
        lines: List[str] = []
        fps = elements.get("fps", 0.0)
        dist = elements.get("distance")
        focus = elements.get("focus")
        head = f"fps {fps:5.1f}"
        if dist is not None:
            head += f" | dist {dist:4.2f}m"
        if focus is not None:
            head += f" | focus {'YES' if focus else 'no '}"
        if "is_true" in elements:
            head += f" | open-set [{score_bar(float(elements['is_true']), 10)}]"
        lines.append(head)
        for name, score in (elements.get("actions") or {}).items():
            req = (elements.get("requires_focus") or {}).get(name, False)
            lines.append(f"  {name:<16} [{score_bar(score)}] {score:4.2f}{' (focus)' if req else ''}")
        if elements.get("log"):
            lines.append(f"  log: {elements['log']}")
        print("\n".join(lines), file=self.stream, flush=True)


class MPLPosePrinter:
    """3D skeleton viewer (reference utils/matplotlib_visualizer.py API)."""

    def __init__(self, interactive: bool = True):
        import matplotlib

        if not os.environ.get("DISPLAY"):
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self.plt = plt
        self.fig = plt.figure()
        self.ax = self.fig.add_subplot(projection="3d")
        if interactive and os.environ.get("DISPLAY"):
            plt.ion()
            plt.show()

    def print_pose(self, pose: np.ndarray, edges: Optional[np.ndarray], color: str = "b") -> None:
        pose = np.asarray(pose).reshape(-1, 3)
        self.ax.scatter(pose[:, 0], pose[:, 1], pose[:, 2], c=color, s=8)
        if edges is not None:
            for a, b in np.asarray(edges):
                self.ax.plot(
                    [pose[a, 0], pose[b, 0]],
                    [pose[a, 1], pose[b, 1]],
                    [pose[a, 2], pose[b, 2]],
                    c=color,
                )
        lim = np.abs(pose).max() + 1e-3
        self.ax.set_xlim(-lim, lim)
        self.ax.set_ylim(-lim, lim)
        self.ax.set_zlim(-lim, lim)

    def clear(self) -> None:
        self.ax.cla()

    def sleep(self, t: float) -> None:
        self.plt.pause(t) if os.environ.get("DISPLAY") else time.sleep(t)

    def save(self, path: str) -> None:
        self.fig.savefig(path)


class ElementsRecorder:
    """Append the elements stream to an .npz trace for offline analysis."""

    def __init__(self, path: str):
        self.path = path
        self.frames: List[Dict[str, Any]] = []

    def show(self, elements: Dict[str, Any]) -> None:
        keep = {
            k: v
            for k, v in elements.items()
            if k in ("pose", "bbox", "actions", "is_true", "focus", "fps", "distance", "log")
        }
        self.frames.append(keep)

    def flush(self) -> None:
        np.savez_compressed(self.path, frames=np.asarray(self.frames, dtype=object))
