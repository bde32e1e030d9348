"""MetricsLogger: JSONL events + optional wandb mirror (stubbed)."""

import json
import sys
import types

import numpy as np


def test_jsonl_events_and_resume(tmp_path):
    from centerfusiondetect3d_tpu.utils.metrics_logger import MetricsLogger

    m = MetricsLogger(str(tmp_path))
    m.scalars({"loss": np.float32(1.5)}, step=0, prefix="train/")
    m.alert("too hot")
    m.summary({"NDS": 0.45})
    events = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert events[0]["train/loss"] == 1.5 and events[0]["step"] == 0
    assert events[1]["kind"] == "alert"
    rid = m.run_id
    # resume keeps the persisted run id (reference logger.py:435-448)
    m2 = MetricsLogger(str(tmp_path), resume=True)
    assert m2.run_id == rid


def test_wandb_mirror_with_stub(tmp_path, monkeypatch):
    """With WANDB_PROJECT set and a wandb module importable, scalars and
    summaries mirror to the wandb run, resumed by the persisted run id
    (reference initWandb, logger.py:421-460)."""
    calls = {"init": [], "log": [], "summary": {}}

    class _Run:
        def __init__(self):
            self.summary = types.SimpleNamespace(
                update=lambda d: calls["summary"].update(d)
            )

        def log(self, payload, step=None):
            calls["log"].append((payload, step))

    stub = types.ModuleType("wandb")

    def _init(**kw):
        calls["init"].append(kw)
        return _Run()

    stub.init = _init
    monkeypatch.setitem(sys.modules, "wandb", stub)
    monkeypatch.setenv("WANDB_PROJECT", "unit")

    from centerfusiondetect3d_tpu.utils.metrics_logger import MetricsLogger

    m = MetricsLogger(str(tmp_path))
    assert calls["init"][0]["project"] == "unit"
    assert calls["init"][0]["id"] == m.run_id
    assert calls["init"][0]["resume"] == "allow"
    m.scalars({"loss": 2.0, "note": float("nan")}, step=3)
    payload, step = calls["log"][0]
    assert payload["loss"] == 2.0 and step == 3
    m.summary({"NDS": 0.4})
    assert calls["summary"] == {"NDS": 0.4}
    # JSONL file still written alongside the mirror
    assert (tmp_path / "metrics.jsonl").exists()


def test_wandb_absent_is_noop(tmp_path, monkeypatch):
    monkeypatch.setenv("WANDB_PROJECT", "unit")
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    from centerfusiondetect3d_tpu.utils.metrics_logger import MetricsLogger

    m = MetricsLogger(str(tmp_path))
    assert m._wandb is None
    m.scalars({"x": 1.0})  # must not raise


def test_wandb_not_hijacked_by_api_key_alone(tmp_path, monkeypatch):
    """An ambient WANDB_API_KEY without an explicit WANDB_PROJECT opt-in
    must NOT start a wandb run (shared machines export the key globally)."""
    stub = types.ModuleType("wandb")

    def _boom(**kw):
        raise AssertionError("wandb.init called without WANDB_PROJECT")

    stub.init = _boom
    monkeypatch.setitem(sys.modules, "wandb", stub)
    monkeypatch.delenv("WANDB_PROJECT", raising=False)
    monkeypatch.setenv("WANDB_API_KEY", "secret")

    from centerfusiondetect3d_tpu.utils.metrics_logger import MetricsLogger

    m = MetricsLogger(str(tmp_path))
    assert m._wandb is None
    m.scalars({"loss": 1.0}, step=0)  # still logs to JSONL, no wandb
