"""Aggregate a JAX Perfetto device trace by fusion class.

    python perf/trace_report.py perf/trace/plugins/profile/<ts>/vm.trace.json.gz [steps]

Prints per-class totals (ms/step, ops/step) over the XLA Ops device
thread — the table format of perf/TRACE_ANALYSIS.md. ``steps`` defaults
to 5 (what perf/profile_step.py captures).
"""

import collections
import gzip
import json
import re
import sys


def classify(name: str) -> str:
    """Collapse op names to their fusion-class stem (fusion.123 → fusion,
    %convolution_add_fusion.5 → convolution_add_fusion)."""
    name = name.split("(")[0].strip().lstrip("%")
    name = re.sub(r"[._-]?\d+$", "", name)
    return name or "?"


def main():
    path = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # Identify threads: metadata events name them.
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = e["args"]["name"]

    # Device op thread: "XLA Ops" only ("XLA Modules" carries the program/
    # while parent spans, which would double-count every nested op).
    device_keys = {k for k, v in tid_names.items() if "XLA Ops" in v}
    if not device_keys:
        print("threads found:", sorted(set(tid_names.values())))
        sys.exit("no XLA Ops thread in trace")

    per_class_us = collections.Counter()
    per_class_n = collections.Counter()
    total_us = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if (e.get("pid"), e.get("tid")) not in device_keys:
            continue
        c = classify(e.get("name", "?"))
        dur = float(e.get("dur", 0.0))
        per_class_us[c] += dur
        per_class_n[c] += 1
        total_us += dur

    print(f"total device op time: {total_us / 1e3 / steps:.1f} ms/step "
          f"({steps} steps)")
    print(f"{'ms/step':>9}  {'ops/step':>8}  class")
    for c, us in per_class_us.most_common(25):
        print(f"{us / 1e3 / steps:9.1f}  {per_class_n[c] // steps:8d}  {c}")


if __name__ == "__main__":
    main()
