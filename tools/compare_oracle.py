"""Local replica of the driver's correctness gate: run every entry in
``__spark_entry__.queries()`` and compare against ``oracle_sql()`` via
DuckDB (row count + sorted-column value comparison).

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        dt = str(pdf[c].dtype)
        if dt.startswith(("int", "uint", "Int", "UInt")):
            pdf[c] = pdf[c].astype("int64")
        elif dt.startswith(("float", "Float")):
            pdf[c] = pdf[c].astype("float64").round(6)
        else:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from dedup_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="oracle_compare")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle sql error: {e}")
            failures.append(name)
            continue
        s, o = normalize(sdf), normalize(odf)
        # pairwise coercion: int64 on one side, float64 on the other →
        # compare both as rounded float64 (mirrors a value-hash on text)
        for c in set(s.columns) & set(o.columns):
            if s[c].dtype != o[c].dtype and all(
                str(x[c].dtype) in ("int64", "float64") for x in (s, o)
            ):
                s[c] = s[c].astype("float64").round(6)
                o[c] = o[c].astype("float64").round(6)
        s = s.sort_values(list(s.columns)).reset_index(drop=True)
        o = o.sort_values(list(o.columns)).reset_index(drop=True)
        if list(s.columns) != list(o.columns):
            print(f"[FAIL] {name}: columns {list(s.columns)} vs {list(o.columns)}")
            failures.append(name)
            continue
        if len(s) != len(o):
            print(f"[FAIL] {name}: rows {len(s)} vs {len(o)}")
            failures.append(name)
            continue
        if not s.equals(o):
            neq = (s != o) & ~(s.isna() & o.isna())
            bad_cols = [c for c in s.columns if neq[c].any()]
            print(f"[FAIL] {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                idx = neq[c].idxmax()
                print(f"    {c}[{idx}]: spark={s[c][idx]!r} oracle={o[c][idx]!r}")
            failures.append(name)
            continue
        print(f"[OK]   {name}: {len(s)} rows")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
