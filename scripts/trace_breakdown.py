"""Aggregate a jax.profiler device trace into an op-category breakdown.

Usage:
    python scripts/trace_model.py     # or any profile_fn(..., trace_dir=...)
    python scripts/trace_breakdown.py /tmp/trace_out [iters]

Finds the newest plugins/profile/*/trace.json.gz under the given dir,
sums device-side leaf events (containers like jit_/while/Scan excluded)
by category, and prints ms/iter. This is how the round-2 glue hunt found
that 20% of the flagship model was XLA "data formatting" layout copies
around the Pallas kernels (docs/PERF.md) — per-op long_names carry the
HLO layouts, printed for the top copies.

Caveat: container exclusion is a name-prefix heuristic (CONTAINERS
below). Nested trace events wrapped by anything NOT matching those
prefixes would be double-counted in the category sums — sanity-check new
traces by comparing the category total against the whole-model ms/iter.
"""

import collections
import glob
import gzip
import json
import re
import sys

CONTAINERS = ("jit_", "while", "Scan", "body", "cond")


def load_events(trace_dir):
    paths = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        sys.exit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)["traceEvents"]


def categorize(name):
    base = re.sub(r"[.\d]+$", "", name)
    if "pallas" in name or "_pallas_path" in name:
        return "pallas:" + name.split(".")[0].split("_pallas")[0].strip("._")
    if base.startswith(("copy", "bitcast")):
        return "COPY/layout"
    if base.startswith(("slice", "dynamic-slice", "dynamic-update-slice",
                        "concatenate", "pad", "reshape", "transpose")):
        return "slice/concat/pad"
    if base.startswith("fusion") or base.endswith("_fusion"):
        return "fusion(elementwise/other)"
    if base.startswith(("convolution", "conv")):
        return "convolution"
    if base.startswith(("reduce", "all-reduce")):
        return "reduce"
    return "other:" + base[:30]


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_out"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    ev = load_events(trace_dir)
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}

    cat = collections.Counter()
    copies = {}
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in pids.get(e["pid"], ""):
            continue
        n = e["name"]
        if any(n.startswith(c) for c in CONTAINERS):
            continue  # container event: children are counted instead
        cat[categorize(n)] += e.get("dur", 0)
        if n.startswith(("copy", "slice", "transpose")):
            rec = copies.setdefault(n, [0, e.get("args", {})])
            rec[0] += e.get("dur", 0)

    total = sum(cat.values())
    print(f"leaf device time: {total / iters / 1000:.1f} ms/iter")
    for k, us in cat.most_common(20):
        print(f"{us / iters / 1000:7.2f} ms/iter  {k}")

    print("\ntop formatting ops (HLO layouts in long_name):")
    for n, (us, args) in sorted(copies.items(), key=lambda kv: -kv[1][0])[:8]:
        print(f"{us / iters:8.0f} us/iter  {n}")
        ln = args.get("long_name", "")
        if ln:
            print(f"          {ln[:140]}")


if __name__ == "__main__":
    main()
