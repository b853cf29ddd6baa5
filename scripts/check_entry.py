"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf dir; compare row count, column names, and
order-insensitive values (stringified, column-name-sorted — like the
driver's value hash).

Usage: python scripts/check_entry.py [sf_dir] [query ...]

Set ``SPARK_GRAFT_FROM_ZIP=1`` to import ``web_crawler_spark`` from
``dist/web_crawler_spark.zip`` INSTEAD of the source tree — the
packaging-regression guard for the spark-submit --py-files path (the
north rule's deployment mode): the gate then proves the zip alone
carries everything the entry needs.
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
if os.environ.get("SPARK_GRAFT_FROM_ZIP", "") == "1":
    zip_path = _ROOT / "dist" / "web_crawler_spark.zip"
    if not zip_path.exists():
        raise SystemExit(f"missing {zip_path}; run scripts/build_pyfiles.sh")
    # the zip must shadow the source tree for the package import, while
    # __spark_entry__ still loads from the repo root (the driver ships it
    # as the main file next to --py-files)
    sys.path.insert(0, str(zip_path))
    sys.path.insert(1, str(_ROOT))
    import web_crawler_spark  # noqa: F401

    src = Path(web_crawler_spark.__file__)
    assert str(zip_path) in str(src), f"package not loaded from zip: {src}"
    print(f"package imported from {src}")
else:
    sys.path.insert(0, str(_ROOT))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6g}"
    except ImportError:
        pass
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_entry")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("SPARK_GRAFT_FROM_ZIP", "") == "1":
        # ship the zip to executors too (the --py-files twin): UDF
        # closures that import web_crawler_spark resolve from it there
        spark.sparkContext.addPyFile(
            str(Path(__file__).resolve().parent.parent / "dist" / "web_crawler_spark.zip")
        )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_count = len(s_rows) == len(d_rows)
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_vals = ok_count and ok_cols and canon(s_rows, s_cols) == canon(d_rows, d_cols)
        status = "OK  " if (ok_count and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status}  {name}: rows {len(s_rows)}/{len(d_rows)} "
            f"cols={'=' if ok_cols else f'{sorted(s_cols)} vs {sorted(d_cols)}'} "
            f"vals={'=' if ok_vals else 'DIFF'} [{time.time()-t0:.1f}s]"
        )
        if not ok_vals and ok_count and ok_cols:
            a, b = canon(s_rows, s_cols), canon(d_rows, d_cols)
            for x, y in zip(a, b):
                if x != y:
                    print(f"      first diff:\n       spark={x}\n       duck ={y}")
                    break
    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
