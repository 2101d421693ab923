#!/usr/bin/env python
"""Summarize a jax.profiler trace (the .trace.json.gz Chrome trace).

    python tools/analyze_trace.py /path/to/plugins/profile/<ts>/<host>.trace.json.gz

Prints device-side op-kind totals and the top ops with shapes/source lines
— enough to find where a restoration step's time goes without TensorBoard.
"""

import collections
import gzip
import json
import re
import sys


def main(path: str, top: int = 20) -> int:
    with gzip.open(path) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in pids.items() if "/device:" in n}

    kind_total = collections.Counter()
    op_total = collections.Counter()
    op_meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if e.get("pid") not in device_pids:
            continue
        name = e["name"]
        if name.startswith(("jit_", "while", "body", "condition")):
            continue  # container events double-count their children
        kind = re.sub(r"[.\d]+$", "", name)
        kind_total[kind] += e["dur"]
        op_total[name] += e["dur"]
        if name not in op_meta and "args" in e:
            a = e["args"]
            op_meta[name] = (
                a.get("shape_with_layout", ""),
                a.get("source", ""),
                a.get("model_flops", 0),
            )
        total += e["dur"]

    print(f"device leaf-op total: {total/1e3:.1f}ms")
    print("\nby op kind:")
    for k, v in kind_total.most_common(12):
        print(f"  {v/1e3:9.1f}ms {100*v/total:5.1f}%  {k}")
    print(f"\ntop {top} ops (aggregated over executions):")
    for name, dur in op_total.most_common(top):
        shape, src, flops = op_meta.get(name, ("", "", 0))
        eff = ""
        try:
            if flops:
                eff = f"  [{float(flops)/1e9:.1f} GF/exec]"
        except (TypeError, ValueError):
            pass
        print(f"  {dur/1e3:9.1f}ms  {name[:44]:44s} {shape[:44]}{eff}")
        if src:
            print(f"             {src}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 20))
