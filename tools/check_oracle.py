#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query...]

Reads each <out_dir>/<name> parquet (Spark result) and runs the matching
oracle_sql.json SQL in DuckDB over the sf_dir parquet tables, then
compares: schema (column names), row count, and values (columns sorted by
name, rows sorted by all columns, floats compared exactly after a stable
stringification — stricter than needed, matching a hash compare).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        # tz-aware -> naive UTC for comparison parity
        if isinstance(col.dtype, pd.DatetimeTZDtype):
            df[c] = col.dt.tz_convert("UTC").dt.tz_localize(None)
    # stable stringification (exact; floats via repr)
    s = df.astype(str)
    s = s.sort_values(by=list(s.columns), kind="mergesort").reset_index(drop=True)
    return s

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            # Mirror Tables.normalizeTemporal's generator-drift armor on
            # the oracle side: whatever storage form a temporal column
            # arrives in (DATE, tz-aware TIMESTAMP, ns-resolution), the
            # view exposes a naive microsecond TIMESTAMP, and BLOB text
            # columns decode to VARCHAR — so a future generator type
            # shift keeps BOTH engines on canonical types. Casts are
            # no-ops for today's already-canonical data (UTC session).
            cols = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()
            sel = []
            for cname, ctype, *_ in cols:
                u = ctype.upper()
                if u in ("DATE", "TIMESTAMP_NS", "TIMESTAMP_S", "TIMESTAMP_MS") \
                        or "WITH TIME ZONE" in u:
                    sel.append(f'CAST("{cname}" AS TIMESTAMP) AS "{cname}"')
                elif u == "BLOB":
                    sel.append(f'CAST("{cname}" AS VARCHAR) AS "{cname}"')
                else:
                    sel.append(f'"{cname}"')
            con.execute(f"CREATE VIEW {t} AS SELECT {', '.join(sel)} "
                        f"FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}   # name -> human-readable status string
    stages = {}    # name -> per-stage booleans, SET WHERE EACH CHECK RUNS
    #  (the CHECK_ORACLE_JSON artifact reads these directly instead of
    #   reverse-engineering stage outcomes from message-string prefixes)
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        st = stages[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False}
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            results[name] = "MISSING-SPARK-OUTPUT"
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            want = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        st["schema_match"] = sorted(got.columns) == sorted(want.columns)
        if not st["schema_match"]:
            results[name] = f"SCHEMA-MISMATCH got={sorted(got.columns)} want={sorted(want.columns)}"
            continue
        st["rows_match"] = len(got) == len(want)
        if not st["rows_match"]:
            results[name] = f"ROWCOUNT got={len(got)} want={len(want)}"
            continue
        g, w = canon(got), canon(want)
        st["hash_match"] = g.equals(w)
        if st["hash_match"]:
            results[name] = "OK"
        else:
            neq = (g != w).any(axis=1)
            idx = list(g.index[neq])[:3]
            diffs = []
            for i in idx:
                diffs.append(f"row{i}: got={g.loc[i].to_dict()} want={w.loc[i].to_dict()}")
            results[name] = "VALUES-MISMATCH " + " | ".join(diffs)
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        mark = "PASS" if v == "OK" else "FAIL"
        print(f"[{mark}] {name}" + ("" if v == "OK" else f" :: {v[:400]}"))
    print(f"== {ok}/{len(results)} OK")
    # Optional artifact in the driver's CORRECTNESS format (set
    # CHECK_ORACLE_JSON=/path.json): rows/schema/hash flags per query.
    art = os.environ.get("CHECK_ORACLE_JSON")
    if art:
        def entry(name, v):
            return dict(stages[name], err=None if v == "OK" else v[:400])
        with open(art, "w") as f:
            json.dump({k: entry(k, v) for k, v in sorted(results.items())},
                      f, indent=1)
    sys.exit(0 if ok == len(results) else 1)

if __name__ == "__main__":
    main()
