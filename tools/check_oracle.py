#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]

Reads each <verify_out_dir>/<name>/ (Spark parquet result), runs the
matching SQL from <verify_out_dir>/oracle_sql.json in DuckDB over the
<sf_dir> parquet tables, normalizes both (columns sorted by name, rows
sorted by all columns), and reports per-query match/mismatch.

Driver-side helper only — NOT part of the library.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
    return df


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    out_dir, sf_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table (MakeScaleDir replicas)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            results[name] = "MISSING spark result"
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df())
            exp = canon(con.execute(sql).df())
        except Exception as e:
            results[name] = f"ERROR {e}"
            continue
        if list(got.columns) != list(exp.columns):
            results[name] = f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWS got={len(got)} exp={len(exp)}"
            continue
        bad = []
        for c in got.columns:
            g, e = got[c], exp[c]
            gf, ef = pd.api.types.is_float_dtype(g), pd.api.types.is_float_dtype(e)
            # Driver-strict: the driver hashes canonical string renderings, so
            # an int64 column on one side vs float64 on the other (e.g. DuckDB
            # SUM(BIGINT) -> HUGEINT -> float64 rendering 15.0 vs Spark's 15)
            # is a mismatch even when numerically equal. Do NOT coerce across
            # the int/float boundary — fail it, like the driver would.
            if gf != ef:
                bad.append(f"{c}: DTYPE spark={g.dtype} oracle={e.dtype} "
                           f"(int-vs-float renders differently under the driver hash)")
                continue
            if gf and ef:
                ga = pd.to_numeric(g, errors="coerce").astype(float)
                ea = pd.to_numeric(e, errors="coerce").astype(float)
                eq = (ga.values == ea.values) | (pd.isna(ga.values) & pd.isna(ea.values))
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[{i}]: {ga.iloc[i]!r} vs {ea.iloc[i]!r} (maxdiff {np.nanmax(np.abs(ga.values - ea.values))})")
            else:
                eq = (g.astype(str).values == e.astype(str).values)
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[{i}]: {g.iloc[i]!r} vs {e.iloc[i]!r}")
        results[name] = "OK rows=%d" % len(got) if not bad else "VALUES " + "; ".join(bad[:3])
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        print(("PASS " if v.startswith("OK") else "FAIL ") + f"{name}: {v}")
    print(f"== {npass}/{len(results)} pass ==")
    if json_out:
        # driver-format sidecar: per-query rows/schema/hash verdicts
        structured = {}
        for name, v in sorted(results.items()):
            rec = {"rows_match": None, "schema_match": None, "hash_match": None,
                   "spark_rows": None, "oracle_rows": None, "err": None}
            if v.startswith("OK"):
                n = int(v.split("rows=")[1])
                rec.update(rows_match=True, schema_match=True, hash_match=True,
                           spark_rows=n, oracle_rows=n)
            elif v.startswith("VALUES"):
                rec.update(rows_match=True, schema_match=True, hash_match=False)
            elif v.startswith("ROWS"):
                rec.update(rows_match=False)
            elif v.startswith("SCHEMA"):
                rec.update(schema_match=False)
            else:
                rec["err"] = v
            structured[name] = rec
        with open(json_out, "w") as f:
            json.dump(structured, f, indent=1, sort_keys=True)
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
