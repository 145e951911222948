#!/usr/bin/env python
"""Parse a jax.profiler trace dir: device ms/step + top-op breakdown.

The trace's device pid carries three thread tracks — "XLA Modules" (one
event per executable run: the step truth), "XLA Ops" (per-fusion), and
"Steps" — plus a host "python" track. Summing across tracks triple-counts;
this parses them separately (the round-3 sweep initially made that mistake).

Usage:
    python scripts/parse_trace.py TRACE_DIR [TRACE_DIR...] [--ops N]
TRACE_DIR is the directory passed to jax.profiler.start_trace (the newest
plugins/profile/*/vm.trace.json.gz under it is read).
"""
import collections
import glob
import gzip
import json
import os
import sys


def load(trace_dir):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f)["traceEvents"]


def tracks(evs):
    tname = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname[(e["pid"], e["tid"])] = e["args"]["name"]
    return tname


def summarize(trace_dir, n_ops=25):
    evs = load(trace_dir)
    tname = tracks(evs)
    mod_tot = mod_cnt = 0
    ops = collections.Counter()
    long_names = {}
    for e in evs:
        if e.get("ph") != "X":
            continue
        t = tname.get((e["pid"], e["tid"]), "")
        if t == "XLA Modules":
            mod_tot += e.get("dur", 0)
            mod_cnt += 1
        elif t == "XLA Ops":
            ops[e["name"]] += e.get("dur", 0)
            if e["name"] not in long_names:
                long_names[e["name"]] = e.get("args", {}).get("long_name", "")
    if not mod_cnt:
        print(f"{trace_dir}: no XLA Modules events (host-only trace?)")
        return None
    ms = mod_tot / mod_cnt / 1e3
    print(f"{trace_dir}: {ms:.2f} ms/step device "
          f"({mod_cnt} executions, op-track total "
          f"{sum(ops.values()) / mod_cnt / 1e3:.2f} ms/step)")
    for name, dur in ops.most_common(n_ops):
        print(f"  {dur / mod_cnt / 1e3:8.3f} ms/step  {name[:44]:44s} "
              f"{long_names[name][:90]}")
    return ms


if __name__ == "__main__":
    n = 25
    argv = sys.argv[1:]
    if "--ops" in argv:
        i = argv.index("--ops")
        n = int(argv[i + 1])
        del argv[i:i + 2]
    args = argv
    for d in args:
        summarize(d, n)
