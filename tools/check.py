#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (dev aid only; not part
of the shipped library). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
Assumes graft.Verify already wrote <verifyOutDir>/<name>/*.parquet and
oracle_sql.json. Registers each test table as a DuckDB view named bare
(lineitem, orders, ...), runs the oracle SQL, and compares against the Spark
parquet exactly: column names (sorted), row count, and cell values in row
order. Exit code = number of mismatching queries.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # ScaleUp writes Spark-style <t>.parquet/ directories; glob those.
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    # Q.noOracle entries get a rows>0 smoke. Driven by the explicit manifest
    # Verify writes (ADVICE r2): a query whose Spark write failed entirely
    # (missing dir) is a FAIL, and stray dirs are ignored.
    manifest_path = os.path.join(out_dir, "no_oracle.json")
    if os.path.exists(manifest_path):
        expected = sorted(json.load(open(manifest_path)))
    else:
        expected = sorted(d for d in os.listdir(out_dir)
                          if d not in oracles and os.path.isdir(os.path.join(out_dir, d)))
    for d in expected:
        if only and d not in only:
            continue
        if not os.path.isdir(os.path.join(out_dir, d)):
            print(f"FAIL {d} (no-oracle): output dir missing (Spark write failed?)")
            n_bad += 1
            continue
        try:
            nrows = con.execute(
                f"SELECT count(*) FROM '{out_dir}/{d}/*.parquet'").fetchone()[0]
        except Exception as e:
            print(f"FAIL {d} (no-oracle): load error: {e}")
            n_bad += 1
            continue
        if nrows > 0:
            print(f"OK   {d} (no-oracle, {nrows} rows)")
        else:
            print(f"FAIL {d} (no-oracle): 0 rows")
            n_bad += 1
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
            duck_df = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_bad += 1
            continue
        s_cols, d_cols = sorted(spark_df.column_names), sorted(duck_df.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_bad += 1
            continue
        if spark_df.num_rows != duck_df.num_rows:
            print(f"FAIL {name}: rows spark={spark_df.num_rows} duck={duck_df.num_rows}")
            n_bad += 1
            continue
        bad = None
        for c in s_cols:
            sv = [norm(x) for x in spark_df.column(c).to_pylist()]
            dv = [norm(x) for x in duck_df.column(c).to_pylist()]
            if sv != dv:
                i = next(i for i, (a, b) in enumerate(zip(sv, dv)) if a != b)
                bad = f"col {c} row {i}: spark={sv[i]!r} duck={dv[i]!r}"
                break
        # schema dtype note (informational; driver may or may not enforce)
        stypes = {f.name: str(f.type) for f in spark_df.schema}
        dtypes = {f.name: str(f.type) for f in duck_df.schema}
        tnote = "" if stypes == dtypes else f"  [dtype diff: " + ", ".join(
            f"{k}:{stypes[k]}/{dtypes[k]}" for k in s_cols if stypes[k] != dtypes[k]) + "]"
        if bad:
            print(f"FAIL {name}: {bad}{tnote}")
            n_bad += 1
        else:
            print(f"OK   {name} ({spark_df.num_rows} rows){tnote}")
    sys.exit(min(n_bad, 120))


if __name__ == "__main__":
    main()
