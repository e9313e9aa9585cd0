"""Local emulation of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
at sf0.01, compare row count + column set + order-insensitive value
hash. Usage: PYTHONPATH=/root/repo python scripts/check_entry.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402
from etl_rs_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6).map(lambda v: f"{v:.6f}" if pd.notna(v) else "<null>")
        elif pd.api.types.is_bool_dtype(s) or str(s.dtype) == "boolean":
            df[c] = s.map(lambda v: str(bool(v)) if pd.notna(v) else "<null>")
        else:
            df[c] = s.map(lambda v: "<null>" if pd.isna(v) else str(v))
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in canon(df).itertuples(index=False):
        h.update(("|".join(map(str, row)) + "\n").encode())
    return h.hexdigest()[:16]


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None) -> int:
    spark = get_spark("check-entry", parallelism=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error {exc}")
            failures += 1
            continue
        dt_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"OK?  {name}: rows-only check, {len(sdf)} rows ({dt_spark:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error {exc}")
            failures += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
            a, b = canon(sdf), canon(odf)
            if a.shape == b.shape:
                neq = (a.reset_index(drop=True) != b.reset_index(drop=True)).any(axis=1)
                print(a[neq.values].head(3).to_string(), "\n--- oracle ---\n", b[neq.values].head(3).to_string())
            else:
                print(f"shape {a.shape} vs oracle {b.shape}\n", a.head(3).to_string(), "\n--- oracle ---\n", b.head(3).to_string())
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows ({dt_spark:.1f}s)")

    # entry() smoke
    n = entrymod.entry(spark).count()
    print(f"entry() -> {n} rows")
    return failures


if __name__ == "__main__":
    # usage: check_entry.py [sf_dir] [query_name ...]
    argv = sys.argv[1:]
    sfd = argv[0] if argv and "/" in argv[0] else "/root/testdata/sf0.01"
    names = [a for a in argv if "/" not in a]
    sys.exit(main(sfd, names or None))
