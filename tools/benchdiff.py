#!/usr/bin/env python3
"""Round-over-round bench regression check.

Usage: python3 tools/benchdiff.py OLD_bench_full.json NEW_bench_full.json

Compares per-query wall time and shuffle bytes between two committed
bench_full.json artifacts. Wall time on this box is noisy (~±30% per
query), so times are flagged only past 1.5x AND >0.5s absolute; shuffle
bytes are deterministic for a fixed plan, so ANY >1.3x movement there
means the PLAN changed — the signal worth investigating regardless of
timing noise.
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    oq, nq = old["queries"], new["queries"]
    osh, nsh = old.get("shuffle_bytes", {}), new.get("shuffle_bytes", {})
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added   : {', '.join(added)}")
    if removed:
        print(f"removed : {', '.join(removed)}")
    flags = 0
    for k in sorted(set(oq) & set(nq)):
        t0, t1 = oq[k], nq[k]
        if t1 > 1.5 * t0 and t1 - t0 > 0.5:
            print(f"TIME    {k}: {t0:.2f}s -> {t1:.2f}s ({t1 / t0:.1f}x)")
            flags += 1
        if k in osh and k in nsh:
            b0 = osh[k]["r"] + osh[k]["w"]
            b1 = nsh[k]["r"] + nsh[k]["w"]
            # gate on EITHER side being >1 MiB: a query that used to
            # shuffle ~nothing (broadcast plan) and now shuffles MBs is
            # exactly the regression to catch, and vice versa
            if max(b0, b1) > 1 << 20 and (b1 > 1.3 * b0 or b1 < b0 / 1.3):
                print(f"SHUFFLE {k}: {b0 / (1 << 20):.1f}MiB -> "
                      f"{b1 / (1 << 20):.1f}MiB (plan shape changed?)")
                flags += 1
    print(f"total   : {old['value']}s -> {new['value']}s; {flags} flag(s)")
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
