#!/usr/bin/env python3
"""Replication-invariant correctness checks for keys whose DuckDB oracle
is infeasible at sf1 (recursive-CTE / 16-md5-per-shingle oracles that
spill or exceed the compare budget).

tools/ScaleUp constructs sf1 as 10 disjoint structure-preserving copies
of sf0.1 (key shift c*N per dimension; documents get a bijective
per-copy token relabeling; embeddings a per-copy sign-flip transform).
Under that construction, deterministic intra-copy operators must
replicate their sf0.1 output EXACTLY 10x, with id columns offset by
c*N — a bit-exact oracle that needs no SQL twin. Keys whose candidate
generation is probabilistic-per-copy (minhash band collisions change
under relabeling) get the exact check on copy 0 (byte-identical text)
plus a per-copy-count tolerance on the rest.

Usage: sf1_invariants.py <sf0.1_dump_dir> <sf1_dump_dir>
"""
import sys
import glob
import pandas as pd

V0, V1 = sys.argv[1], sys.argv[2]
DOC_N = 5000        # sf0.1 documents rows; ScaleUp offsets doc ids by c*DOC_N
COPIES = 10
failures = []


def load(v, k):
    fs = sorted(glob.glob(f"{v}/{k}/*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in fs], ignore_index=True)


def check(key, ok, msg=""):
    print(f"{'PASS' if ok else 'FAIL'} {key} {msg}")
    if not ok:
        failures.append(key)


def replicated(key, id_cols, span, exact_copies=range(COPIES)):
    """sf1 == union over copies of (sf0.1 with id_cols offset by c*span)."""
    a, b = load(V0, key), load(V1, key)
    cols = list(a.columns)
    want = []
    for c in exact_copies:
        w = a.copy()
        for ic in id_cols:
            w[ic] = w[ic] + c * span
        want.append(w)
    want = pd.concat(want, ignore_index=True)
    got = b
    if len(exact_copies) != COPIES:  # restrict to the checked copies
        m = pd.Series(True, index=b.index)
        for ic in id_cols:
            m &= (b[ic] // span).isin(list(exact_copies))
        got = b[m]
    ws = want.sort_values(cols).reset_index(drop=True)
    gs = got[cols].sort_values(cols).reset_index(drop=True)
    ok = ws.equals(gs)
    check(key, ok,
          f"(copies {list(exact_copies)[0]}..{list(exact_copies)[-1]}: "
          f"{len(gs)} rows vs {len(ws)} expected, bit-exact={ok})")
    return a, b


def scaled_counts(key, group_cols, count_cols, ratio_cols=()):
    """Per-group counters x10, ratio columns unchanged."""
    a, b = load(V0, key), load(V1, key)
    m = a.merge(b, on=list(group_cols), suffixes=("_0", "_1"))
    ok = len(m) == len(a) == len(b)
    for c in count_cols:
        ok = ok and (m[f"{c}_1"] == COPIES * m[f"{c}_0"]).all()
    for c in ratio_cols:
        ok = ok and (m[f"{c}_1"] == m[f"{c}_0"]).all()
    check(key, ok, f"({count_cols} x{COPIES}, {list(ratio_cols)} equal)")
    return a, b


# g03: one giant component of the same size per copy -> count x10
scaled_counts("g03_components", ["sz"], ["n_components"])

# g08: wedge/triangle counters x10, closure ratio (bp) unchanged — the
# supplier projection never crosses copies, so triangles replicate
a8, b8 = load(V0, "g08_triangles"), load(V1, "g08_triangles")
ok8 = all(int(b8[c][0]) == COPIES * int(a8[c][0])
          for c in ("n_proj_edges", "n_wedges", "n_triangles")) and \
    int(b8["closure_bp"][0]) == int(a8["closure_bp"][0])
check("g08_triangles", ok8,
      f"(edges/wedges/triangles x{COPIES}, closure_bp equal)")

# g06: peeling trace — same rounds, node/edge counts x10
scaled_counts("g06_kcore", ["round"], ["n_nodes", "n_edges"])

# d05 / d08 / d11: deterministic shingle/CC pipelines — bit-exact
# replicate-with-offset on every copy (bijective relabeling preserves
# every Jaccard value, group id, and token count)
replicated("d05_ngram_jaccard", ["a_id", "b_id"], DOC_N)
replicated("d08_dedup_groups", ["doc_id", "group_rep"], DOC_N)
replicated("d11_dedup_survivors", ["doc_id", "group_rep"], DOC_N)

# d03: LSH banding is probabilistic per relabeled copy — copy 0 must be
# byte-exact (text unchanged); other copies: per-copy pair counts equal
# to copy 0's (recall at these thresholds is total: every true pair's
# bands collide), checked as a count, not row-exact
a3, b3 = replicated("d03_dedup_minhash_lsh", ["a_id", "b_id"], DOC_N,
                    exact_copies=[0])
per_copy = (b3["a_id"] // DOC_N).value_counts()
check("d03_per_copy_counts",
      len(per_copy) == COPIES and (per_copy == len(a3)).all(),
      f"(per-copy pair counts: {sorted(per_copy.unique())} vs {len(a3)})")

# d18 evaluates the simhash(hamming<=8, 16-bit chunk blocking) DETECTOR
# against exact-Jaccard truth. Only the truth side is construction-
# pinned (x10 exact). The detector's candidate volume legitimately grows
# superlinearly — 16-bit chunk collisions have a ~n^2/65536 random
# component that caps dampen — and its per-copy recall wobbles because
# relabeled copies draw fresh simhash values. Pin what the construction
# guarantees, bound the rest, and REPORT the measured candidate growth
# (that number is the scale finding, see PROBE_r11).
a18, b18 = load(V0, "d18_detector_eval"), load(V1, "d18_detector_eval")
det_ratio = b18["n_detected"][0] / a18["n_detected"][0]
ok18 = (int(b18["n_true"][0]) == COPIES * int(a18["n_true"][0])
        and int(b18["n_hit"][0]) >= int(0.95 * COPIES * int(a18["n_hit"][0]))
        and int(b18["n_hit"][0]) <= int(b18["n_true"][0])
        and float(b18["recall"][0]) >= 0.95 * float(a18["recall"][0])
        and det_ratio <= COPIES * COPIES)
check("d18_detector_eval", ok18,
      f"(n_true x10 exact; recall {a18['recall'][0]}->{b18['recall'][0]}; "
      f"detector candidates x{det_ratio:.1f} — superlinear chunk-collision "
      f"component, measured not hidden)")

# d20: total candidate pairs x10 exactly; per-bucket histogram may
# redistribute (signatures change under relabeling) but the calibration
# curve (est_bp per matches) is fixed by construction
a20, b20 = load(V0, "d20_minhash_calibration"), load(V1, "d20_minhash_calibration")
m20 = a20.merge(b20, on=["matches", "est_bp"], suffixes=("_0", "_1"))
ok20 = len(m20) == len(a20) == len(b20) and \
    int(b20["n_pairs"].sum()) == COPIES * int(a20["n_pairs"].sum())
check("d20_minhash_calibration", ok20,
      f"(total pairs {int(b20['n_pairs'].sum())} == "
      f"{COPIES}x{int(a20['n_pairs'].sum())}; bucket grid preserved)")

print(("ALL INVARIANTS PASS" if not failures else
       f"{len(failures)} FAILED: {failures}"))
sys.exit(1 if failures else 0)
