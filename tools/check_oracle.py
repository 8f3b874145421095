#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's DuckDB correctness gate.

Runs graft.Verify (Spark) into a temp dir, then executes each oracle SQL in
DuckDB over the same parquet tables and compares results STRICTLY:
column names (sorted), row counts, and exact cell values in result order.
Strict pass here implies a pass under any laxer driver compare.

Usage: python3 tools/check_oracle.py [sfdir] [--only q01,q02] [--skip-spark]
"""
import json
import math
import re
import subprocess
import sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.001"
OUT = "/tmp/graft_verify_out"
ONLY = None
for a in sys.argv:
    if a.startswith("--only"):
        ONLY = set(a.split("=", 1)[1].split(","))
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_spark():
    # wipe stale outputs: Verify catches per-query failures, and a leftover
    # parquet from a previous run would otherwise compare (and pass) silently
    import shutil
    shutil.rmtree(OUT, ignore_errors=True)
    # forward the --only filter: a single-query check must not pay the
    # full 180+-query Spark run
    flt = f" {','.join(sorted(ONLY))}" if ONLY else ""
    subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}{flt}'],
        cwd="/root/repo", check=True, capture_output=True, text=True)


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    # Typed compare: the driver hashes typed values, so 1 (BIGINT) != 1.0
    # (DOUBLE) there even though Python's == says otherwise. Mirror that.
    if type(a) is not type(b):
        return False
    if isinstance(a, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: our conventions should give bit-identical doubles
    return a == b


def main():
    if "--skip-spark" not in sys.argv:
        print(f"running Spark Verify at {SF} ...")
        run_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())
    # Fail fast on a mistyped --only name: matching nothing would print
    # "0 pass, 0 fail" and exit 0 — a silently green verification.
    if ONLY:
        missing = sorted(ONLY - set(oracle))
        if missing:
            print(f"ERROR: --only names not in oracle_sql.json: {missing}")
            sys.exit(2)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if ONLY and name not in ONLY:
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = spark_rel.select(
                ", ".join(f'"{c}"' for c in spark_cols)).fetchall()
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = con.sql(f'SELECT {", ".join(chr(34)+c+chr(34) for c in duck_cols)} FROM ({sql})').fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}")
            n_fail += 1
            continue
        # Declared-type compare: DuckDB fetches HUGEINT and BIGINT both as
        # Python int, so cell compares alone can't see a SUM()->HUGEINT
        # promotion that the driver's typed hash WILL flag. Compare the
        # relations' declared column types per (sorted) column. Integer
        # WIDTHS are normalized (int32 vs int64 passed the round-1 driver
        # hash; HUGEINT and DOUBLE-vs-BIGINT failed it).
        def norm_type(t):
            return re.sub(r"\b(TINYINT|SMALLINT|INTEGER|BIGINT)\b", "INT", str(t))
        spark_types = {c: norm_type(t) for c, t in zip(spark_rel.columns, spark_rel.types)}
        duck_types = {c: norm_type(t) for c, t in zip(duck_rel.columns, duck_rel.types)}
        type_bad = [(c, spark_types[c], duck_types[c])
                    for c in spark_cols if spark_types[c] != duck_types[c]]
        if type_bad:
            c, ts, td = type_bad[0]
            print(f"FAIL {name}: col {c} type spark={ts} duck={td}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount {len(spark_rows)} vs {len(duck_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (ra, rb) in enumerate(zip(spark_rows, duck_rows)):
            for c, (x, y) in zip(spark_cols, zip(ra, rb)):
                if not cmp_cell(x, y):
                    bad = (i, c, x, y)
                    break
            if bad:
                break
        if bad:
            i, c, x, y = bad
            print(f"FAIL {name}: row {i} col {c}: spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
