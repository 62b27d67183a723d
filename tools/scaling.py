#!/usr/bin/env python3
"""Per-query scaling exponents between two bench JSONs (r14 task 1).

Usage: tools/scaling.py <bench_small.json> <bench_large.json> [scale_ratio]

exponent e = log(t_large / t_small) / log(scale_ratio): e ~ 1 is linear
in the data, e < 1 sub-linear (fixed costs amortizing), e > 1
superlinear (the thing the scale validation exists to catch).

Caveats printed with the table:
  - queries under FLOOR seconds at BOTH scales are scheduling/lifecycle
    floor-bound; their exponents are noise and are reported as '-'.
  - the s* scrape family reads the reference fixture tree, not the sf
    dir — scale-independent by construction (reported 'fixture').
"""
import json
import math
import sys

FLOOR = 0.7  # below this at both scales, wall is stage-scheduling floor

def main() -> None:
    small = json.load(open(sys.argv[1]))
    large = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs = small["queries"]
    ql = large["queries"]
    rows = []
    for k in sorted(qs):
        if k not in ql:
            continue
        t0, t1 = qs[k]["sec"], ql[k]["sec"]
        ok = qs[k].get("ok", True) and ql[k].get("ok", True)
        if k.startswith("s") and not k.startswith("st"):
            tag = "fixture"
            e = None
        elif t0 < FLOOR and t1 < FLOOR:
            tag = "floor"
            e = None
        else:
            e = math.log(t1 / t0) / math.log(ratio)
            tag = ("SUPER" if e > 1.15 else "~lin" if e > 0.6 else "sub")
        rows.append((k, t0, t1, e, tag, ok))
    rows.sort(key=lambda r: (-(r[3] if r[3] is not None else -9)))
    print(f"{'query':28s}{'t_small':>9s}{'t_large':>9s}{'exp':>7s}  tag")
    for k, t0, t1, e, tag, ok in rows:
        es = f"{e:7.2f}" if e is not None else "      -"
        flag = "" if ok else "  FAILED"
        print(f"{k:28s}{t0:9.2f}{t1:9.2f}{es}  {tag}{flag}")
    # TOTAL over the shared ok-in-both queries only — summing each
    # file's full set would let a query present (or failed-fast) in one
    # run skew the headline exponent against the per-query table
    shared = [k for k in qs if k in ql and qs[k].get("ok", True) and ql[k].get("ok", True)]
    tot0 = sum(qs[k]["sec"] for k in shared)
    tot1 = sum(ql[k]["sec"] for k in shared)
    print(f"\n{'TOTAL (shared ok)':28s}{tot0:9.1f}{tot1:9.1f}"
          f"{math.log(tot1 / tot0) / math.log(ratio):7.2f}")
    dropped = (set(qs) | set(ql)) - set(shared)
    if dropped:
        print(f"excluded from TOTAL (missing or failed in a run): {sorted(dropped)}")

if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # |head etc. closing stdout is fine
        pass
