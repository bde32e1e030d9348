"""Observability: logging, timers, meters, loss plots, device health.

TPU-native re-design of the reference's logging/monitoring stack
(/root/reference/src/lib/utils/utils.py:20-339, logger.py:369-485,
trainer.py:100-124): timestamped run directories with file+console logging,
device-synced stage timers, running-average meters, end-of-run loss plots,
FLOPs estimation via jax cost analysis, and a device-memory health monitor
with a tolerance counter (the TPU analogue of the reference's GPU
temperature/throttle guard - temperature is not exposed through PJRT, HBM
pressure is the failure mode that matters here).
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Optional


def create_logger(output_root: str, name: str, to_file: bool = True):
    """Run directory `<root>/<name>/<timestamp>` + configured logger."""
    ts = time.strftime("%Y-%m-%d-%H-%M")
    out_dir = os.path.join(output_root, name, ts)
    os.makedirs(out_dir, exist_ok=True)
    logger = logging.getLogger(f"cfd3d.{name}")
    logger.setLevel(logging.INFO)
    logger.propagate = False  # root handlers (absl/jax) would double-print
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if to_file:
        fh = logging.FileHandler(os.path.join(out_dir, "train.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger, out_dir


class AverageMeter:
    """Running average (utils/utils.py:324-339)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = self.avg = 0.0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / self.count if self.count else 0.0


class StageTimer:
    """Per-stage wall timing with device sync (utils/utils.py:52-66 analogue).

    Call ``stop`` with the stage's output pytree; arrays are block-fetched so
    the measurement covers real device execution, not async dispatch.
    """

    def __init__(self):
        self.meters: Dict[str, AverageMeter] = defaultdict(AverageMeter)
        self._start: Dict[str, float] = {}

    def start(self, stage: str):
        self._start[stage] = time.perf_counter()

    def stop(self, stage: str, sync_tree=None):
        if sync_tree is not None:
            import jax

            for leaf in jax.tree.leaves(sync_tree):
                if hasattr(leaf, "block_until_ready"):
                    leaf.block_until_ready()
        dt = time.perf_counter() - self._start.pop(stage)
        self.meters[stage].update(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}

    def report(self) -> str:
        return " | ".join(f"{k} {m.avg * 1e3:.1f}ms" for k, m in self.meters.items())


class ToleranceCounter:
    """N consecutive failures trip the guard (logger.py:463-485)."""

    def __init__(self, tolerance: int = 5):
        self.tolerance = tolerance
        self.count = 0

    def ok(self):
        self.count = 0

    def fail(self) -> bool:
        self.count += 1
        return self.count >= self.tolerance


class DeviceHealthMonitor:
    """HBM-pressure guard with tolerance semantics (logger.py:369-418 analogue)."""

    def __init__(self, hbm_fraction_limit: float = 0.95, tolerance: int = 5,
                 logger: Optional[logging.Logger] = None):
        self.limit = hbm_fraction_limit
        self.counter = ToleranceCounter(tolerance)
        self.logger = logger or logging.getLogger("cfd3d.health")

    def check(self):
        """Raise RuntimeError after `tolerance` consecutive over-limit reads."""
        import jax

        try:
            stats = jax.local_devices()[0].memory_stats()
        except Exception:
            return  # backend without memory_stats: nothing to check
        if not stats:
            return
        used = stats.get("bytes_in_use", 0)
        limit = stats.get("bytes_limit", 0)
        if not limit:
            return
        frac = used / limit
        if frac > self.limit:
            self.logger.warning(
                "device memory high: %.1f%% of %.2f GiB", frac * 100, limit / 2 ** 30
            )
            if self.counter.fail():
                raise RuntimeError(
                    f"device memory above {self.limit:.0%} for "
                    f"{self.counter.tolerance} consecutive checks - suspending"
                )
        else:
            self.counter.ok()


def estimate_cost(fn, *args) -> Dict[str, float]:
    """FLOPs/bytes via XLA cost analysis (thop.profile analogue,
    trainer.py:112-117)."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    try:
        analysis = lowered.compile().cost_analysis()
    except Exception:
        analysis = lowered.cost_analysis()
    if not analysis:
        return {}
    return {
        "flops": float(analysis.get("flops", 0.0)),
        "bytes_accessed": float(analysis.get("bytes accessed", 0.0)),
    }


def trace_profile(out_dir: str):
    """Context manager: capture a jax.profiler device trace under out_dir
    (jax.profiler analogue of the reference's per-stage CUDA timers)."""
    import contextlib

    import jax

    @contextlib.contextmanager
    def ctx():
        path = os.path.join(out_dir, "profile")
        os.makedirs(path, exist_ok=True)
        with jax.profiler.trace(path):
            yield path

    return ctx()


def plot_lr_schedule(config, out_path: str, start_epoch: int = 0):
    """Plot the full LR schedule (learningRateTest analogue,
    modelWithLoss.py:364-432)."""
    from ..training.schedule import learning_rate

    epochs = list(range(start_epoch, config.TRAIN.EPOCHS))
    lrs = [learning_rate(config, e, start_epoch) for e in epochs]
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(epochs, lrs)
        ax.set_yscale("log")
        ax.set_xlabel("epoch")
        ax.set_ylabel("lr")
        ax.set_title(f"{config.TRAIN.LR_SCHEDULER} schedule")
        fig.tight_layout()
        fig.savefig(out_path)
        plt.close(fig)
    except Exception:
        pass
    return list(zip(epochs, lrs))


def plot_history(history: Dict[str, Dict[str, list]], out_dir: str):
    """Loss curves per head for train/val (utils/utils.py:235-322)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    heads = sorted({k for split in history.values() for k in split})
    if not heads:
        return None
    n = len(heads)
    cols = min(4, n)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 3 * rows), squeeze=False)
    for i, head in enumerate(heads):
        ax = axes[i // cols][i % cols]
        for split, losses in history.items():
            if head in losses:
                ax.plot(losses[head], label=split)
        ax.set_title(head)
        ax.legend()
    fig.tight_layout()
    path = os.path.join(out_dir, "losses.png")
    fig.savefig(path)
    plt.close(fig)
    with open(os.path.join(out_dir, "history.json"), "w") as f:
        json.dump(history, f)
    return path
