"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` from __spark_entry__ on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then compares
row count, column-name set, and an order-insensitive value comparison (sort
columns by name, sort rows, exact cell equality). Use this BEFORE the driver
does: any mismatch here is a mismatch in CORRECTNESS_r{N}.json.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # canonical cell representation: stringify with care for floats/None
    def cell(x):
        if x is None or (isinstance(x, float) and pd.isna(x)):
            return "<null>"
        if isinstance(x, float):
            return repr(x)
        return str(x)

    out = pdf.apply(lambda col: col.map(cell))
    if len(out.columns):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
            drop=True
        )
    return out


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> bool:
    ok = True
    if len(spark_pdf) != len(duck_pdf):
        print(f"  ROWS MISMATCH: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        ok = False
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        print(f"  SCHEMA MISMATCH: spark={s_cols} duck={d_cols}")
        return False
    if ok:
        a, b = normalize(spark_pdf), normalize(duck_pdf)
        if not a.equals(b):
            ok = False
            neq = (a != b).any(axis=1)
            print("  VALUE MISMATCH; first diffs:")
            print("   spark:", a[neq].head(3).to_dict("records"))
            print("   duck :", b[neq].head(3).to_dict("records"))
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from em_connected_components_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]",
                      shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)

    n_ok = n_bad = n_skip = 0
    for name in names:
        fn = qs[name]
        if name not in oracles:
            try:
                cnt = fn(spark, args.sf).count()
                print(f"{name}: NO-ORACLE rows={cnt}")
                n_skip += 1
            except Exception:
                print(f"{name}: NO-ORACLE FAILED")
                traceback.print_exc()
                n_bad += 1
            continue
        try:
            spark_pdf = fn(spark, args.sf).toPandas()
            con = duck_connection(args.sf)
            duck_pdf = con.execute(oracles[name]).fetchdf()
            con.close()
            if compare(name, spark_pdf, duck_pdf):
                print(f"{name}: MATCH rows={len(spark_pdf)}")
                n_ok += 1
            else:
                print(f"{name}: MISMATCH")
                n_bad += 1
        except Exception:
            print(f"{name}: ERROR")
            traceback.print_exc()
            n_bad += 1
    print(f"== {n_ok} match, {n_bad} bad, {n_skip} rows-only ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
