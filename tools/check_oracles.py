"""Local replica of the driver's correctness gate: run every queries()[k]
on Spark and oracle_sql()[k] on DuckDB over the same sf dir, compare
row count, column names, and exact values (rows sorted by all columns).

Usage: python tools/check_oracles.py [sf_dir] [key ...]

Run it at MORE than the driver's sf0.01 before shipping — the sf0.1 pass
is what exposed the stateful-politeness multi-chunk ordering bug that
small scales cannot reach (groups fitting one Arrow batch hide it).
SPARK_GRAFT_ANSI=true replicates the driver's ANSI-on session.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if sorted(a.columns) != sorted(b.columns):
        return f"columns differ: spark={sorted(a.columns)} duck={sorted(b.columns)}"
    if len(a) != len(b):
        return f"row count differs: spark={len(a)} duck={len(b)}"
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype == np.float64:
            ok = np.allclose(av, bv, rtol=0, atol=0, equal_nan=True)
            if not ok:
                d = np.nanmax(np.abs(av - bv))
                return f"col {c}: max abs diff {d!r}"
        else:
            if not (av == bv).all():
                i = int(np.argmax(av != bv))
                return f"col {c}: first diff at row {i}: {av[i]!r} vs {bv[i]!r}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from jirlbot_spark.session import get_spark

    spark = get_spark(
        app_name="check-oracles", master="local[8]", shuffle_partitions=8
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for key, fn in qs.items():
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {key}: spark error: {e}")
            failures += 1
            continue
        t1 = time.time()
        if key not in oracles:
            ok = len(sdf) >= 0
            print(
                f"ROWS  {key}: {len(sdf)} rows ({t1 - t0:.1f}s) [rows-only]"
            )
            continue
        try:
            ddf = con.execute(oracles[key]).fetchdf()
        except Exception as e:
            print(f"FAIL  {key}: duckdb error: {str(e).splitlines()[0]}")
            failures += 1
            continue
        err = compare(sdf, ddf)
        if err:
            print(f"FAIL  {key}: {err}  (spark {t1 - t0:.1f}s)")
            failures += 1
        else:
            print(f"OK    {key}: {len(sdf)} rows (spark {t1 - t0:.1f}s)")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
