"""Unit tests for the observability utilities (SURVEY §5.1/§5.3:
timers/meters, tolerance guard, device health monitor, XLA cost
analysis — reference utils/utils.py:52-66,324-339, logger.py:369-485)."""

import logging

import numpy as np
import pytest

from centerfusiondetect3d_tpu.utils.observability import (
    AverageMeter, DeviceHealthMonitor, StageTimer, ToleranceCounter,
    estimate_cost)


def test_average_meter():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.val == 4.0 and m.count == 4
    assert m.avg == pytest.approx((2.0 + 12.0) / 4)
    m.reset()
    assert m.avg == 0.0 and m.count == 0


def test_stage_timer_syncs_and_averages():
    import jax.numpy as jnp

    t = StageTimer()
    t.start("fwd")
    out = jnp.ones((4,)) * 2
    dt = t.stop("fwd", out)
    assert dt >= 0.0
    t.start("fwd")
    t.stop("fwd")
    assert set(t.summary()) == {"fwd"}
    assert t.meters["fwd"].count == 2
    assert "fwd" in t.report()


def test_tolerance_counter_trips_after_n_consecutive():
    c = ToleranceCounter(tolerance=3)
    assert not c.fail() and not c.fail()
    c.ok()  # reset: the two failures were not consecutive with the next
    assert not c.fail() and not c.fail()
    assert c.fail()  # third consecutive -> trips


def test_health_monitor_tolerance(monkeypatch):
    mon = DeviceHealthMonitor(hbm_fraction_limit=0.5, tolerance=2,
                              logger=logging.getLogger("t"))

    class Dev:
        def memory_stats(self):
            return {"bytes_in_use": 90, "bytes_limit": 100}

    import jax

    monkeypatch.setattr(jax, "local_devices", lambda: [Dev()])
    mon.check()  # first over-limit read: warns only
    with pytest.raises(RuntimeError, match="consecutive"):
        mon.check()  # second consecutive trips


def test_health_monitor_recovers(monkeypatch):
    mon = DeviceHealthMonitor(hbm_fraction_limit=0.5, tolerance=2)
    stats = {"bytes_in_use": 90, "bytes_limit": 100}

    class Dev:
        def memory_stats(self):
            return dict(stats)

    import jax

    monkeypatch.setattr(jax, "local_devices", lambda: [Dev()])
    mon.check()
    stats["bytes_in_use"] = 10  # pressure clears -> counter resets
    mon.check()
    stats["bytes_in_use"] = 90
    mon.check()  # 1 of 2 again: must NOT raise


def test_estimate_cost_reports_flops():
    import jax.numpy as jnp

    def f(a, b):
        return a @ b

    cost = estimate_cost(f, jnp.ones((8, 16)), jnp.ones((16, 4)))
    # 2*M*N*K = 2*8*4*16 = 1024 flops (XLA may report exactly this)
    assert cost.get("flops", 0) > 0
