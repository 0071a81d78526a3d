"""Local replica of the driver's correctness gate.

Runs every query in ``__spark_entry__.queries()`` at sf0.01 and
compares against ``oracle_sql()`` via DuckDB: row count, sorted column
names, and an order-insensitive value hash. Use while iterating so a
query never reaches the driver un-verified.

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _canon(v):
    """Canonicalise a cell value the way the driver's hash compare does:
    floats to repr, None stable, everything else str."""
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    """Order-insensitive hash: sort columns by name, render each row,
    sort rows, sha256."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted("\x01".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in rendered:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    from pyspark.sql import SparkSession

    from tools.fixture_cache import default_fixture_env

    default_fixture_env()  # reuse content-keyed fixtures across runs

    from __spark_entry__ import oracle_sql, queries

    spark = (SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
             .appName("check-correctness")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = queries()
    oracles = oracle_sql()
    only = set(sys.argv[1:])
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
            entry = {"rows": len(srows), "cols": sorted(scols)}
            if name in oracles:
                ores = con.sql(oracles[name])
                ocols = ores.columns
                orows = ores.fetchall()
                entry["oracle_rows"] = len(orows)
                entry["rows_match"] = len(srows) == len(orows)
                entry["schema_match"] = sorted(scols) == sorted(ocols)
                sh = value_hash(scols, [tuple(r) for r in srows])
                oh = value_hash(ocols, orows)
                entry["hash_match"] = sh == oh
                if not entry["hash_match"] and entry["rows_match"] and len(srows) <= 20:
                    entry["spark_sample"] = [str(r) for r in srows[:3]]
                    entry["oracle_sample"] = [str(r) for r in orows[:3]]
            else:
                entry["rows_only"] = True
                entry["rows_match"] = len(srows) >= 0
            results[name] = entry
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps(results, indent=2, default=str))
    ok = all(r.get("hash_match", r.get("rows_match", False)) and "error" not in r
             for r in results.values())
    print("ALL GREEN" if ok else "FAILURES PRESENT")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
