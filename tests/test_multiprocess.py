"""REAL multi-process distributed validation (SURVEY §5.8).

Spawns two separate Python processes that initialize jax.distributed over a
local coordinator (CPU backend, gloo collectives) and run
``all_gather_detections`` — the reference's torch.distributed.all_gather
eval collective (progressBar.py:85-93) — asserting each process sees both
shards. This exercises the actual cross-process path, not a virtual mesh.
"""

import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    sys.path.insert(0, {repo!r})
    from centerfusiondetect3d_tpu.parallel.distributed import (
        all_gather_detections, initialize, is_main_process)
    initialize(f"127.0.0.1:{{port}}", num_processes=n, process_id=pid)
    assert jax.process_count() == n, jax.process_count()
    import numpy as np, jax.numpy as jnp
    local = {{"scores": jnp.full((2, 3), float(pid)),
              "ids": jnp.arange(3) + 10 * pid}}
    out = all_gather_detections(local)
    scores = np.asarray(out["scores"])
    assert scores.shape == (2 * n, 3), scores.shape
    got = sorted(set(scores[:, 0].tolist()))
    assert got == [float(i) for i in range(n)], got
    assert is_main_process() == (pid == 0)
    print(f"OK{{pid}}")
    """
).format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_two_process_all_gather(tmp_path):
    port = 9300 + os.getpid() % 500
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-2000:]}"
        assert f"OK{pid}" in out
