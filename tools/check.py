#!/usr/bin/env python3
"""Compare graft.Verify parquet outputs against the DuckDB oracle.

Mirrors the driver's t2 check: for each query with oracle SQL, run the
SQL in DuckDB over the same tables, sort columns by name, and compare
row-for-row (results must already be totally ordered by the query).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single parquet FILES; Spark-derived
        # corpora (tools/derive_sf1.scala) write parquet DIRECTORIES
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # GRAFT_SKIP_ORACLES: comma-separated query names downgraded to
    # rows-only for THIS run. Use case: q_dedup_clusters at derived
    # sf1, whose recursive transitive-closure CTE is infeasible there
    # (~1.3e9 closure rows through the 36k-doc giant component) -
    # tools/check_clusters.py is its exact union-find replacement.
    # Without this the sf1 pass needed a manual oracle_sql.json edit.
    for skip in filter(None, os.environ.get(
            "GRAFT_SKIP_ORACLES", "").split(",")):
        oracle.pop(skip.strip(), None)
    results = {}
    import time
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        print(f"[check] {name} ...", file=sys.stderr, flush=True)
        t0 = time.time()
        spark_df = pd.read_parquet(path)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}"
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        s = spark_df[sorted(spark_df.columns)]
        d = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(d.columns):
            results[name] = f"COLUMN_MISMATCH spark={list(s.columns)} duck={list(d.columns)}"
            continue
        if len(s) != len(d):
            results[name] = f"ROWCOUNT spark={len(s)} duck={len(d)}"
            continue
        bad = None
        # dtype-strict: the driver hashes serialized values, so ANY
        # dtype difference (HUGEINT->float64 vs int64, int32 vs int64,
        # ...) can fail its hash even when tolist() values compare
        # equal. Exact string compare — as of r4 every oracled query
        # matches raw dtypes on both sides, so there is nothing to
        # normalize away and strictness is free insurance.
        for c in s.columns:
            if str(s[c].dtype) != str(d[c].dtype):
                bad = (f"DTYPE col={c}: spark={s[c].dtype} duck={d[c].dtype}"
                       " (driver hash is dtype-sensitive)")
                break
            sv, dv = s[c].tolist(), d[c].tolist()
            if sv != dv:
                # locate first diff
                for i, (x, y) in enumerate(zip(sv, dv)):
                    if x != y and not (x is None and y is None):
                        if isinstance(x, float) and isinstance(y, float):
                            if x != x and y != y:  # both NaN
                                continue
                        bad = f"VALUE col={c} row={i}: spark={x!r} duck={y!r}"
                        break
                if bad:
                    break
        results[name] = bad or f"OK rows={len(s)}"
        print(f"[check] {name} done in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_rows_only = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        flag = "  " if v.startswith(("OK", "ROWS_ONLY")) else "!!"
        print(f"{flag} {k}: {v}")
    print(f"\n{n_ok} OK, {n_rows_only} rows-only, "
          f"{len(results) - n_ok - n_rows_only} FAILING, {len(results)} total")
    missing = [q for q in oracle if q not in results]
    if missing:
        print("MISSING OUTPUTS (query failed to run):", missing)
main(sys.argv[1], sys.argv[2])
