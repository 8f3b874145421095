#!/usr/bin/env python3
"""Round-over-round per-query bench regression report.

Usage: tools/bench_diff.py OLD NEW [--top N]

OLD / NEW each name a file carrying a per-query bench line — either the
artifact `graft.Bench` writes (bench_queries.json: one JSON object with a
"queries" map of best-of-reps seconds) or any text file containing such a
line (a raw bench stdout capture works; BENCH_rN.json does NOT — the
driver's 2000-char tail capture drops the per-query line, which is why the
file artifact exists).

Prints: totals, the top-N regressions and improvements by absolute delta
seconds, and queries added/removed between the rounds. Methodology note:
only compare runs taken with the same reps/SF/host — best-of-1 vs
best-of-3 or a busy host produces phantom deltas (the r4 lesson).
"""
import json
import re
import sys


def load_queries(path):
    text = open(path, encoding="utf-8", errors="replace").read()
    # exact artifact: a single JSON object
    try:
        d = json.loads(text)
        if isinstance(d, dict) and isinstance(d.get("queries"), dict):
            return d["queries"], d.get("value")
    except ValueError:
        pass
    # embedded line: find the {"metric":...,"queries":{...}} object
    for m in re.finditer(r'\{"metric":[^\n]*"queries":\{[^}]*\}[^\n]*\}', text):
        try:
            d = json.loads(m.group())
            if isinstance(d.get("queries"), dict):
                return d["queries"], d.get("value")
        except ValueError:
            continue
    raise SystemExit(f"{path}: no per-query bench line found")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 10
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1]) if "=" in a else int(a[5:] or 10)
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, old_total = load_queries(args[0])
    new, new_total = load_queries(args[1])
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    deltas = [(q, float(new[q]) - float(old[q]), float(old[q]), float(new[q]))
              for q in shared]
    shared_old = sum(d[2] for d in deltas)
    shared_new = sum(d[3] for d in deltas)
    print(f"old total: {old_total} s ({len(old)} queries)  "
          f"new total: {new_total} s ({len(new)} queries)")
    print(f"shared {len(shared)} queries: {shared_old:.3f} -> {shared_new:.3f} s "
          f"({shared_new - shared_old:+.3f})")
    if added:
        tot = sum(float(new[q]) for q in added)
        print(f"added ({len(added)}, {tot:.3f} s): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    regs = sorted((d for d in deltas if d[1] > 0), key=lambda d: -d[1])[:top]
    imps = sorted((d for d in deltas if d[1] < 0), key=lambda d: d[1])[:top]
    print(f"\ntop {len(regs)} regressions:")
    for q, d, o, n in regs:
        print(f"  {q:42s} {o:8.3f} -> {n:8.3f}  ({d:+.3f} s, {d / o * 100 if o else 0:+.0f}%)")
    print(f"\ntop {len(imps)} improvements:")
    for q, d, o, n in imps:
        print(f"  {q:42s} {o:8.3f} -> {n:8.3f}  ({d:+.3f} s, {d / o * 100 if o else 0:+.0f}%)")


if __name__ == "__main__":
    main()
