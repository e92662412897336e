#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/oracle_check.py [sfDir] [outDir]

1. `sbt runMain graft.Verify <sfDir> <outDir>` must have been run already
   (or pass --run to run it here).
2. For each query output parquet in outDir, run the matching oracle SQL
   from oracle_sql.json in DuckDB (tables = views over sfDir parquet),
   sort columns by name, sort rows, and compare values exactly.
"""
import json, os, subprocess, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft-verify"
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
                       cwd="/root/repo", check=True)

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        got = pd.read_parquet(path)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}" + ("" if len(got) else "  << EMPTY")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(e)}"
            continue
        # Dtype-FAMILY parity first: the driver hashes rendered values, so
        # int32 123 == int64 123 and datetime64[ns] == datetime64[us] pass,
        # but int64 123 vs float64 123.0 (the r7 class: DuckDB sum(BIGINT)
        # -> HUGEINT -> pandas float64) renders differently and fails the
        # driver's hash even though loose value comparison succeeds. Compare
        # the dtype KIND (i/u fold together), then compare exact rendered
        # values — no float tolerance — or this gate is weaker than the
        # driver's (r7 shipped "132/132" locally; driver failed 5).
        import decimal
        def fam(col):
            # an all-NULL column has no observable family (a NULL Decimal
            # arrives as object-of-None while DuckDB renders float64 NaN) —
            # wildcard it; the value compare still demands null==null
            if col.isna().all():
                return "null"
            k = col.dtype.kind if hasattr(col.dtype, "kind") else "O"
            f = {"i": "int", "u": "int", "f": "float", "b": "bool",
                 "M": "datetime", "m": "timedelta"}.get(k, "object")
            # Spark DECIMAL arrives as object-of-Decimal; DuckDB fetchdf
            # renders DECIMAL as float64 — the driver passes those lanes
            # (q03 r7), so fold exact decimals into the float family.
            if f == "object" and col.dropna().map(
                    lambda v: isinstance(v, decimal.Decimal)).all() and len(col.dropna()):
                return "float"
            return f
        dtype_mis = [f"{c}(spark={g[c].dtype},duck={e[c].dtype})"
                     for c in g.columns
                     if fam(g[c]) != fam(e[c])
                     and "null" not in (fam(g[c]), fam(e[c]))]
        if dtype_mis:
            results[name] = f"DTYPE_MISMATCH cols={dtype_mis}"
            continue
        mismatched = []
        for c in g.columns:
            gc, ec = g[c], e[c]
            try:
                if gc.isna().all() and ec.isna().all():
                    ok = True  # all-NULL both sides: renderings differ (None vs NaN) but values agree
                elif fam(gc) == "float" or fam(ec) == "float":
                    # exact float equality (post-coercion) — no tolerance;
                    # the repo's doubles are bit-identical by design
                    ok = ((gc.isna() & ec.isna()) |
                          (gc.astype(float) == ec.astype(float))).all()
                else:
                    ok = (gc.astype(str) == ec.astype(str)).all()
            except Exception as ex:
                ok = False
            if not ok:
                mismatched.append(c)
        results[name] = "OK" if not mismatched else f"VALUE_MISMATCH cols={mismatched}"
        if mismatched:
            for c in mismatched[:2]:
                diff = g[c].astype(str) != e[c].astype(str)
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"  [{name}.{c}] row {i}: spark={g[c][i]!r} duck={e[c][i]!r}")

    # A query that CRASHED in graft.Verify never writes its dump dir, so
    # iterating outDir alone would silently shrink the denominator (the
    # round-8 ts-type break produced 32 missing dumps and a green-looking
    # "136/136 pass"). Every oracle key must have a dump — absent = FAIL.
    for name in oracle:
        if name not in results:
            results[name] = "MISSING_DUMP (query crashed in graft.Verify?)"

    bad = 0
    for name, r in sorted(results.items()):
        print(f"{'PASS' if r == 'OK' or r.startswith('ROWS_ONLY rows=') and 'EMPTY' not in r else 'FAIL'}  {name}: {r}")
        if not (r == "OK" or (r.startswith("ROWS_ONLY") and "EMPTY" not in r)):
            bad += 1
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
