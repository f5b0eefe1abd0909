#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Spark parquet dump, sort columns by
name + rows by all columns, and compare values exactly (report float
deltas when inexact). Usage: compare.py <sfdir> <verify_outdir>
"""
import sys, json, glob
import duckdb, pandas as pd, numpy as np

sfdir, vout = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# own spill dir: concurrent compares sharing the cwd-default
# .tmp/duckdb_temp_storage clobber each other (r11, sf1 leg)
import tempfile
con.sql(f"SET temp_directory='{tempfile.mkdtemp(prefix='duckcmp_')}'")
import os
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = f.split("/")[-1].removesuffix(".parquet")
    # driver layout = single .parquet file; ScaleUp (sf1 leg) layout =
    # Spark-written directory of part files — glob inside in that case
    src = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{vout}/oracle_sql.json"))
# Optional argv[3]: comma-list of keys — iteration aid matching Verify's
# SPARK_GRAFT_ONLY. The real gate always runs without it (all keys).
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
fail = ok = 0
for name in sorted(oracle):
    if only is not None and name not in only:
        continue
    sql = oracle[name]
    try:
        rel = con.sql(sql)
        # Driver hashes TYPED results: a DuckDB HUGEINT (e.g. an un-cast
        # window sum) can never hash-match Spark's BIGINT even when every
        # value is equal. Reject it here so the local gate is at least as
        # strict as the hard signal (r6's p07 lesson).
        huge = [c for c, t in zip(rel.columns, rel.types)
                if str(t).upper() in ("HUGEINT", "UHUGEINT")]
        if huge:
            print(f"FAIL {name}: oracle emits HUGEINT column(s) {huge} — "
                  f"CAST to BIGINT in the oracle SQL")
            fail += 1
            continue
        ddf = rel.df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}")
        fail += 1
        continue
    try:
        sdf = pd.concat([pd.read_parquet(p) for p in
                         sorted(glob.glob(f"{vout}/{name}/*.parquet"))],
                        ignore_index=True) if glob.glob(f"{vout}/{name}/*.parquet") \
            else pd.read_parquet(f"{vout}/{name}")
    except Exception as e:
        # A query that crashed in Verify leaves NO dump (or an unreadable
        # one); that must be a loud failure, not a silently absent key.
        print(f"FAIL {name}: spark dump missing/unreadable ({e})")
        fail += 1
        continue
    if list(sdf.columns) == ["__graft_error"]:
        msg = sdf["__graft_error"].iloc[0] if len(sdf) else "?"
        print(f"FAIL {name}: spark query errored in Verify: {msg}")
        fail += 1
        continue
    ddf = ddf.reindex(sorted(ddf.columns), axis=1)
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    if list(ddf.columns) != list(sdf.columns):
        print(f"FAIL {name}: columns duck={list(ddf.columns)} spark={list(sdf.columns)}")
        fail += 1
        continue
    if len(ddf) != len(sdf):
        print(f"FAIL {name}: rows duck={len(ddf)} spark={len(sdf)}")
        fail += 1
        continue
    # Strict dtype-family check (int vs int, float vs float, ...): the
    # driver hashes typed results, so an int-valued float64 column on one
    # side is a hash mismatch even if every value compares equal.
    def fam(dt):
        if np.issubdtype(dt, np.integer): return "int"
        if np.issubdtype(dt, np.floating): return "float"
        if np.issubdtype(dt, np.bool_): return "bool"
        if np.issubdtype(dt, np.datetime64): return "datetime"
        return "object"
    dt_bad = [f"{c} duck={ddf[c].dtype} spark={sdf[c].dtype}"
              for c in ddf.columns if fam(ddf[c].dtype) != fam(sdf[c].dtype)]
    if dt_bad:
        print(f"FAIL {name}: dtype family mismatch: " + "; ".join(dt_bad))
        fail += 1
        continue
    # normalize types for compare
    def norm(df):
        out = df.copy()
        for c in out.columns:
            if np.issubdtype(out[c].dtype, np.datetime64):
                out[c] = out[c].astype("datetime64[us]")
            elif out[c].dtype == object:
                out[c] = out[c].astype(str)
        return out.sort_values(list(out.columns)).reset_index(drop=True)
    d, s = norm(ddf), norm(sdf)
    bad = []
    for c in d.columns:
        if np.issubdtype(d[c].dtype, np.floating):
            if not np.allclose(d[c], s[c], rtol=0, atol=0, equal_nan=True):
                mx = np.nanmax(np.abs(d[c] - s[c]))
                bad.append(f"{c} maxdiff={mx:.3e}")
        else:
            if not d[c].equals(s[c]):
                n = int((d[c] != s[c]).sum())
                bad.append(f"{c} {n} diffs e.g. duck={d[c][d[c]!=s[c]].head(2).tolist()} spark={s[c][d[c]!=s[c]].head(2).tolist()}")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad))
        fail += 1
    else:
        ok += 1
rows_only = [p.split('/')[-1] for p in glob.glob(f"{vout}/*")
             if '/' in p and p.split('/')[-1] not in oracle
             and p.split('/')[-1] != 'oracle_sql.json']
print(f"\n{ok} ok, {fail} fail, rows-only (no oracle): {sorted(rows_only)}")
