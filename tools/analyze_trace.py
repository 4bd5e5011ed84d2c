"""Summarize a jax.profiler trace: top device ops by total duration.

Usage: python tools/analyze_trace.py /tmp/fusion_trace [top_n]
"""

import collections
import glob
import gzip
import json
import re
import sys


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files under", trace_dir)
        return 1
    path = max(files)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # device-side complete events, grouped by normalized op name
    by_op = collections.Counter()
    counts = collections.Counter()
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        # strip fusion numbering so variants aggregate
        base = re.sub(r"[.\d]+$", "", name)
        by_op[base] += e["dur"]
        counts[base] += 1
    total = sum(by_op.values())
    print(f"trace: {path}")
    print(f"total device-op time: {total/1e3:.1f} ms over {sum(counts.values())} events")
    print(f"{'op':60s} {'ms':>10s} {'%':>6s} {'n':>6s}")
    for op, dur in by_op.most_common(top_n):
        print(f"{op[:60]:60s} {dur/1e3:10.1f} {100*dur/total:6.1f} {counts[op]:6d}")

    # copy/transpose bucket breakdown — the memory-bound tail that is the
    # usual optimization target once matmul/conv run near peak
    copy_re = re.compile(r"copy|transpose|bitcast|concatenate|dynamic-slice|"
                         r"dynamic_slice|dynamic-update|reshape|slice|pad|gather",
                         re.IGNORECASE)
    copies = {op: d for op, d in by_op.items() if copy_re.search(op)}
    csum = sum(copies.values())
    print(f"\ncopy/data-movement bucket: {csum/1e3:.1f} ms "
          f"({100*csum/max(total,1):.1f}% of device time)")
    for op, dur in sorted(copies.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {op[:58]:58s} {dur/1e3:10.1f} {counts[op]:6d}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
