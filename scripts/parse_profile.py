"""Summarize a jax.profiler trace into a per-op device-time table.

jax.profiler.trace works over this image's axon tunnel (writes
``plugins/profile/<ts>/*.trace.json.gz``); TensorBoard is absent, so this
parses the trace-viewer JSON directly: filter the ``/device:TPU:0`` process
lane, sum ``dur`` per op name, print the top-N. Used to find the round-2
hot spots (two full sorts in decode+frustum top-k, stem layout copies).

    python scripts/parse_profile.py /tmp/jaxprof [--top 30]

Capture a trace with::

    with jax.profiler.trace("/tmp/jaxprof"):
        for _ in range(3):
            np.asarray(step(...))          # fetch to force execution

or ``TPU.PROFILE: true`` in the config (Trainer traces the first epoch).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_events(root: str):
    paths = sorted(
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True)
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    with gzip.open(paths[-1]) as f:
        return json.load(f)["traceEvents"], paths[-1]


def summarize(events, top: int = 25):
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "/device:" in n}
    by_name = collections.Counter()
    src = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            name = e["name"]
            by_name[name] += e["dur"]
            args = e.get("args") or {}
            if name not in src and "source" in args:
                src[name] = str(args["source"])
    total = sum(v for k, v in by_name.items() if not k.startswith("jit_"))
    print(f"device lanes: {[pids[p] for p in dev_pids]}")
    print(f"total device op time: {total / 1e3:.1f} ms "
          f"({len(by_name)} unique ops)\n")
    print(f"{'ms':>9}  {'%':>5}  op  [source]")
    shown = 0
    for name, us in by_name.most_common():
        if name.startswith("jit_"):  # module wrapper lane, already in ops
            continue
        if shown >= top:
            break
        shown += 1
        pct = 100 * us / max(total, 1)
        loc = src.get(name, "")
        loc = f"  [{loc}]" if loc else ""
        print(f"{us / 1e3:9.2f}  {pct:5.1f}  {name[:80]}{loc[:60]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    events, path = load_events(args.trace_dir)
    print(f"trace: {path}")
    summarize(events, args.top)


if __name__ == "__main__":
    main()
