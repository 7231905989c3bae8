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


def get_color(value: float) -> str:
    """Score -> traffic-light color (reference utils/output.py:8-15)."""
    if value < 0.33:
        return "red"
    if value < 0.66:
        return "orange"
    return "green"


class GUIVisualizer:
    """Interactive 2x2 GUI panel (reference VISPYVisualizer, utils/output.py:8-280).

    Matplotlib-backed (vispy is not a dependency of this rebuild):

    - top-left: 3D skeleton (one line per edge)
    - top-right: info — distance, FOCUS flag, FPS, per-action score bars
      with traffic-light coloring, the focus "eye" marker for actions that
      require focus, and the open-set bar next to the winning action
    - bottom-left: camera image + person bbox (blue) + face bbox
      (green when in focus, red otherwise)
    - bottom-right: command help + typed input line + log line

    Keyboard console semantics match the reference printer
    (utils/output.py:20-34): printable keys append, backspace deletes,
    Enter submits the command (exposed via :meth:`commands` for
    ``run_source(..., command_stream=gui.commands())``), '\\' toggles
    rendering, '`' toggles the open-set bar.

    Headless tests use ``backend="Agg"`` + :meth:`render` (offscreen RGB).
    """

    HELP = [
        "ADD ACTION: add action_name [-focus]",
        "SAVE: save",
        "LOAD: load",
        "DEBUG: debug",
        "REMOVE ACTION: remove action_name",
    ]

    def __init__(self, backend: Optional[str] = None, figsize=(12, 6)):
        import matplotlib

        if backend:
            matplotlib.use(backend, force=True)
        import matplotlib.pyplot as plt

        self._plt = plt
        self.show_enabled = True
        self.show_os = True
        self.input_text = ">"
        self.log_text = ""
        self._pending: List[str] = []

        self.fig = plt.figure(figsize=figsize)
        self.fig.patch.set_facecolor("black")
        self.ax3d = self.fig.add_subplot(2, 2, 1, projection="3d")
        self.ax_info = self.fig.add_subplot(2, 2, 2)
        self.ax_img = self.fig.add_subplot(2, 2, 3)
        self.ax_cmd = self.fig.add_subplot(2, 2, 4)
        self.fig.canvas.mpl_connect("key_press_event", self._on_key)
        self._interactive = backend is None or "agg" not in str(backend).lower()

    # ------------------------------------------------------------ keyboard

    def _on_key(self, event) -> None:
        """Reference printer() contract (utils/output.py:20-34)."""
        key = event.key
        if key == "backspace":
            if len(self.input_text) > 1:
                self.input_text = self.input_text[:-1]
            self.log_text = ""
        elif key == "enter":
            self._pending.append(self.input_text[1:])  # do not send '>'
            self.input_text = ">"
            self.log_text = ""
        elif key == "\\":
            self.show_enabled = not self.show_enabled
        elif key == "`":
            self.show_os = not self.show_os
        elif key == "escape":
            self._pending.append("quit")
        elif key is not None and len(key) == 1:
            self.input_text += key
        elif key == "space":
            self.input_text += " "

    def commands(self):
        """Iterator for ``run_source(command_stream=...)``: yields one
        pending typed command per frame ('' when none)."""
        while True:
            yield self._pending.pop(0) if self._pending else ""

    # ------------------------------------------------------------ rendering

    def show(self, elements: Dict[str, Any]) -> None:
        if self.show_enabled:
            self._draw(elements)
            if self._interactive:
                self.fig.canvas.draw_idle()
        if self._interactive:
            # ALWAYS pump the GUI event loop — this is the only pump in the
            # run_source loop, so skipping it while rendering is toggled
            # off ('\\') would freeze the window and eat every later
            # keystroke, including the one to re-enable.
            self._plt.pause(0.001)

    def render(self, elements: Dict[str, Any]) -> np.ndarray:
        """Offscreen render -> (h, w, 3) uint8 RGB (for tests / recording)."""
        self._draw(elements)
        self.fig.canvas.draw()
        buf = np.asarray(self.fig.canvas.buffer_rgba())
        return buf[..., :3].copy()

    def _style_axis(self, ax) -> None:
        ax.set_facecolor("black")
        ax.set_xticks([])
        ax.set_yticks([])
        for s in ax.spines.values():
            s.set_color("gray")

    def _draw(self, elements: Dict[str, Any]) -> None:
        if "log" in elements:
            self.log_text = str(elements["log"])

        # --- 3D skeleton
        ax = self.ax3d
        ax.clear()
        ax.set_facecolor("black")
        pose = elements.get("pose")
        edges = elements.get("edges")
        if pose is not None and edges is not None:
            pose = np.asarray(pose)
            for a, b in np.asarray(edges):
                seg = pose[[int(a), int(b)]]
                # camera-frame -> display: x right, z depth, -y up
                ax.plot(seg[:, 0], seg[:, 2], -seg[:, 1], color="purple",
                        marker="o", markersize=2, linewidth=2)
            ax.set_xlim(-1, 1)
            ax.set_ylim(0, 3)
            ax.set_zlim(-1, 1)

        # --- info panel
        ax = self.ax_info
        ax.clear()
        self._style_axis(ax)
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
        dist = elements.get("distance")
        focus = elements.get("focus")
        ax.text(0.25, 0.9, f"DIST: {dist:.2f}m" if dist is not None else "DIST:",
                color="white", ha="center")
        ax.text(0.5, 0.9, "FOCUS" if focus else "NOT FOC.",
                color="green" if focus else "red", ha="center")
        ax.text(0.75, 0.9, f"FPS: {elements.get('fps', 0.0):.2f}", color="white", ha="center")
        ax.text(7 / 16, 0.78, "rf", color="white", ha="center", fontsize=8)
        ax.text(5 / 8, 0.78, "fs score", color="white", ha="center", fontsize=8)
        ax.text(7 / 8, 0.78, "os score", color="white", ha="center", fontsize=8)

        from matplotlib.patches import Rectangle as _Rect

        actions = elements.get("actions") or {}
        requires_focus = elements.get("requires_focus") or {}
        is_true = float(elements.get("is_true", 0.0))
        best = max(actions.values()) if actions else None
        for i, (name, score) in enumerate(actions.items()):
            y = 0.6 - 0.1 * i
            # action label: green when accepted by the open-set head (and
            # focus, if required) — reference output.py:252-258
            label_color = "white"
            if score == best and is_true > 0.66:
                if requires_focus.get(name, False):
                    label_color = "green" if focus else "orange"
                else:
                    label_color = "green"
            ax.text(3 / 16, y, name, color=label_color, ha="center", va="center")
            if requires_focus.get(name, False):
                ax.add_patch(_Rect((7 / 16 - 0.025, y - 0.03), 0.05, 0.06,
                                   color="green" if focus else "red"))
            ax.add_patch(_Rect((0.5, y - 0.03), max(0.0, min(1.0, score)) * 0.25, 0.06,
                               color=get_color(score)))
            if score == best and self.show_os:
                ax.add_patch(_Rect((0.75, y - 0.03), max(0.0, min(1.0, is_true)) * 0.25,
                                   0.06, color=get_color(is_true)))

        # --- camera image + bboxes
        ax = self.ax_img
        ax.clear()
        self._style_axis(ax)
        img = elements.get("img")
        if img is not None:
            img = np.ascontiguousarray(np.asarray(img)[..., ::-1])  # BGR -> RGB
            try:
                import cv2

                if elements.get("bbox") is not None:
                    x1, x2, y1, y2 = (int(v) for v in elements["bbox"])
                    cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), 3)
                if elements.get("face_bbox") is not None:
                    x1, y1, x2, y2 = (int(v) for v in np.asarray(elements["face_bbox"]).reshape(-1))
                    color = (0, 255, 0) if focus else (255, 0, 0)
                    cv2.rectangle(img, (x1, y1), (x2, y2), color, 3)
            except ImportError:
                pass
            ax.imshow(img)

        # --- command console
        ax = self.ax_cmd
        ax.clear()
        self._style_axis(ax)
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
        for i, line in enumerate(self.HELP):
            ax.text(0.05, 0.9 - 0.1 * i, line, color="white", fontsize=9, ha="left")
        ax.text(0.05, 0.3, self.input_text, color="violet", fontsize=11, ha="left")
        ax.text(0.05, 0.2, self.log_text, color="orange", fontsize=11, ha="left")
