"""Multi-host (multi-process) SPMD helpers.

The reference is single-node DDP (trainer.py:65-69, GPU-count check
main.py:44-47); here multi-host scaling is jax.distributed + the same mesh
code: each host feeds its local batch shard, XLA runs one SPMD program over
all chips, and gradient psum rides ICI/DCN automatically. Eval detections are
fixed-size (B, K, .) tensors, so cross-host collection is a process_allgather
(the reference's torch.distributed.all_gather, progressBar.py:85-93).
"""

from __future__ import annotations

from typing import Any, Dict, Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op when single-process / already up).

    NOTE: must run before any backend query — even ``jax.process_count()``
    initializes the backends, after which ``jax.distributed.initialize``
    refuses to run (validated by the live 2-process CPU test,
    tests/test_multiprocess.py).
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except ValueError:
        pass  # single-process run without cluster env configuration
    except RuntimeError as e:
        msg = str(e).lower()
        if "before any jax" in msg or "computations" in msg:
            # a backend query already ran: swallowing this would silently
            # leave every host single-process, training the full dataset
            # N times over the same checkpoint dir
            raise
        if "already" in msg or "initialize" in msg:
            return  # already initialized (e.g. by the launcher)
        raise


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def all_gather_detections(detections: Dict[str, Any]) -> Dict[str, Any]:
    """Gather per-host detection shards to every host (rank-0 scores them).

    Single-process: identity fetch. Multi-process: process_allgather over the
    leading batch axis.
    """
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), detections)

    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(detections, tiled=True)
    return jax.tree.map(np.asarray, gathered)
