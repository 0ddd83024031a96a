"""Summarize an xprof framework_op_stats JSON (as saved by
profile_trace_100k.py / profile_shard_tpu.py): top device ops by total
self time.

Usage: python benchmarks/trace_summary.py /tmp/tlfea_trace/op_stats.json [N]
"""

import json
import sys


def load_rows(path):
    with open(path) as f:
        js = json.load(f)
    out = []
    for t in js if isinstance(js, list) else [js]:
        cols = [c["id"] for c in t.get("cols", [])]
        for r in t.get("rows", []):
            vals = [c.get("v") for c in r.get("c", [])]
            out.append(dict(zip(cols, vals)))
    return out


def main(path, top=30):
    rows = [r for r in load_rows(path) if r.get("host_or_device") == "Device"]
    rows.sort(key=lambda r: -(r.get("total_self_time") or 0))
    tot = sum(r.get("total_self_time") or 0 for r in rows)
    print(f"total device self time: {tot/1e3:.2f} ms over {len(rows)} ops")
    print(f"{'self_us':>10} {'x':>6} {'per_call':>9}  {'type':22} operation")
    for r in rows[:top]:
        t = r.get("total_self_time") or 0
        n = int(r.get("occurrences") or 1)
        name = str(r.get("operation", ""))
        print(f"{t:10.0f} {n:6d} {t/n:9.1f}  {str(r.get('type','')):22} "
              f"{name[-80:]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
