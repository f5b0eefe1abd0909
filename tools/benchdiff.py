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
        shuffle_same = None
        if k in osh and k in nsh:
            b0 = osh[k]["r"] + osh[k]["w"]
            b1 = nsh[k]["r"] + nsh[k]["w"]
            shuffle_same = b1 <= 1.3 * b0 and b1 >= b0 / 1.3
            # gate on EITHER side being >1 MiB: a query that used to
            # shuffle ~nothing (broadcast plan) and now shuffles MBs is
            # exactly the regression to catch, and vice versa
            if max(b0, b1) > 1 << 20 and not shuffle_same:
                print(f"SHUFFLE {k}: {b0 / (1 << 20):.1f}MiB -> "
                      f"{b1 / (1 << 20):.1f}MiB (plan shape changed?)")
                flags += 1
        # cpu_ms is the load-calibrated gate (r10/r11): a cpu jump with
        # BYTE-IDENTICAL shuffle is contention noise (executorCpuTime
        # inflates up to ~26x under sustained box load) — adjudicated as
        # UNSTABLE, not flagged as a regression. A cpu jump WITH a
        # shuffle change is the real thing.
        c0 = osh.get(k, {}).get("cpu_ms")
        c1 = nsh.get(k, {}).get("cpu_ms")
        if c0 and c1 and c1 > 2 * c0 and c1 - c0 > 500:
            if shuffle_same:
                print(f"UNSTABLE {k}: cpu {c0}ms -> {c1}ms with unchanged "
                      f"shuffle — contention, not a plan regression")
            else:
                print(f"CPU     {k}: {c0}ms -> {c1}ms ({c1 / c0:.1f}x)")
                flags += 1
        elif t1 > 1.5 * t0 and t1 - t0 > 0.5 and not (c0 and c1):
            # wall fallback only when either artifact predates cpu_ms
            print(f"TIME    {k}: {t0:.2f}s -> {t1:.2f}s ({t1 / t0:.1f}x)")
            flags += 1
    print(f"total   : {old['value']}s -> {new['value']}s; {flags} flag(s)")
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
