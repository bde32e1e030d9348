"""Structured run-metrics logging (wandb-analogue, file-based).

The reference logs losses/visualizations/alerts to wandb
(/root/reference/src/lib/utils/logger.py:35-485); this environment has no
wandb, so runs log append-only JSONL events (scalars per epoch/step, eval
summaries, alerts) that any dashboard can tail, plus an on-disk latest-state
snapshot. Interface kept minimal and dependency-free.

When the ``wandb`` package IS importable and ``WANDB_PROJECT`` is set,
every event from process 0 is additionally mirrored to a wandb run —
resumed by the persisted ``run_id`` exactly like the reference's
``initWandb`` id persistence (logger.py:421-460). Absent either, the mirror
is a silent no-op, so the adapter costs nothing in this image.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, output_dir: str, run_id: Optional[str] = None,
                 resume: bool = False):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self.state_path = os.path.join(output_dir, "run_state.json")
        if resume and os.path.exists(self.state_path):
            with open(self.state_path) as f:
                self.run_id = json.load(f).get("run_id", run_id)
        else:
            self.run_id = run_id or time.strftime("%Y%m%d-%H%M%S")
        self._write_state({"run_id": self.run_id, "started": time.time()})
        self._wandb = self._init_wandb()

    def _init_wandb(self):
        """Optional wandb mirror (reference logger.py:421-460): requires the
        package AND explicit WANDB_PROJECT opt-in (an ambient WANDB_API_KEY
        alone must not hijack runs); resumes by persisted run_id. Only
        process 0 mirrors — every rank calling wandb.init with the same run
        id would interleave writers (the reference inits wandb once)."""
        if not os.environ.get("WANDB_PROJECT"):
            return None
        try:
            import jax

            if jax.process_index() != 0:
                return None
        except Exception:
            pass
        try:
            import wandb
        except ImportError:
            return None
        try:
            return wandb.init(
                project=os.environ.get("WANDB_PROJECT", "centerfusiondetect3d"),
                id=self.run_id, resume="allow",
            )
        except Exception:
            return None

    def _write_state(self, extra: Dict[str, Any]):
        state = {}
        if os.path.exists(self.state_path):
            try:
                with open(self.state_path) as f:
                    state = json.load(f)
            except Exception:
                state = {}
        state.update(extra)
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.state_path)

    def log(self, kind: str, payload: Dict[str, Any], step: Optional[int] = None):
        event = {"ts": time.time(), "run_id": self.run_id, "kind": kind}
        if step is not None:
            event["step"] = step
        event.update(payload)
        with open(self.path, "a") as f:
            f.write(json.dumps(_jsonable(event)) + "\n")
        if self._wandb is not None:
            try:
                self._wandb.log(
                    {k: v for k, v in _jsonable(payload).items()
                     if isinstance(v, (int, float))},
                    step=step,
                )
            except Exception:
                pass  # mirror is best-effort (safe_run analogue)

    def scalars(self, scalars: Dict[str, float], step: Optional[int] = None,
                prefix: str = ""):
        self.log("scalars", {prefix + k: float(v) for k, v in scalars.items()}, step)

    def alert(self, message: str, level: str = "warning"):
        self.log("alert", {"level": level, "message": message})

    def summary(self, summary: Dict[str, Any]):
        self._write_state({"summary": _jsonable(summary)})
        if self._wandb is not None:
            try:
                self._wandb.summary.update(_jsonable(summary))
            except Exception:
                pass


def _jsonable(x):
    if isinstance(x, dict):
        return {str(k): _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if hasattr(x, "item") and getattr(x, "size", 2) == 1:
        return x.item()
    if hasattr(x, "tolist"):
        return x.tolist()
    return x
