"""Cross-engine exactness helpers.

The driver compares Spark output against DuckDB by value hash, so
results must match EXACTLY, not approximately. Rules used by every
query in this package:

1. Money/metric aggregation happens in DECIMAL, never double: decimal
   arithmetic is exact and associative, so Spark's parallel partial
   aggregation and DuckDB's sequential sum produce identical values.
   The final decimal is exported to double THROUGH A STRING
   (`decimal_to_double`): both engines parse a decimal digit string
   with correct rounding, whereas their native decimal->double
   conversions can disagree by one ulp (observed on q01 at sf0.1 —
   invisible at sf0.01).
2. Products of decimals are kept within 38 digits of precision: inputs
   are DECIMAL(18,4); one product yields (37,8); before a further
   multiply we cast back down to (18,6), which is exact for these 2dp
   inputs.
3. Timestamps are output as epoch microseconds (Spark unix_micros /
   DuckDB epoch_us) — avoids string-formatting differences.
4. Ratios of exact integers/decimals are computed double/double from
   identical operands, then rounded — identical doubles in, identical
   out.
5. Every result set is deterministic: any top-k has a total order with
   a unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_conf
from ..tables import load

MONEY = "decimal(18,4)"
MONEY_NARROW = "decimal(18,6)"  # re-narrowing target after one product


def money(col) -> Column:
    """Exact decimal view of a 2dp double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def decimal_to_double(c: Column) -> Column:
    """Exact decimal -> double via its digit string: string parse is
    correctly rounded in both engines (SQL mirror:
    CAST(CAST(x AS VARCHAR) AS DOUBLE))."""
    return c.cast("string").cast("double")


def dsum(col, alias: str) -> Column:
    """Exact decimal sum, exported as double."""
    c = F.col(col) if isinstance(col, str) else col
    return decimal_to_double(F.sum(c.cast(MONEY))).alias(alias)


def micros(col) -> Column:
    """Timestamp -> epoch microseconds (bigint)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table with harness-safe session conf applied."""
    apply_runtime_conf(spark)
    return load(spark, sf_dir, name)


def inputs_fingerprint(sf_dir: str) -> str:
    """Cheap fingerprint of the sf parquet inputs: sorted
    (relpath, size, mtime_ns) of every *.parquet file under sf_dir.
    Stamped into _FIXTURE_OK so a cached fixture is only reused while
    its inputs are byte-for-byte the same files — regenerating
    /root/testdata under the same paths flips the stamp and forces a
    rebuild even though the persistent cache key (source hash) is
    unchanged."""
    import hashlib
    import os

    h = hashlib.sha256()
    entries = []
    for dirpath, dirnames, filenames in os.walk(sf_dir):
        dirnames.sort()
        for fn in filenames:
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, fn)
            try:
                st = os.stat(p)
                entries.append((os.path.relpath(p, sf_dir),
                                st.st_size, st.st_mtime_ns))
            except OSError:
                entries.append((os.path.relpath(p, sf_dir), -1, -1))
    for rel, size, mtime in sorted(entries):
        h.update(f"{rel}|{size}|{mtime}\n".encode())
    return h.hexdigest()[:16]


def fixture_dir(name: str, sf_dir: str, build) -> str:
    """Cache of a DETERMINISTIC on-disk fixture (an index, a
    multi-commit merge table) shared by every query run in this
    process — bench runs the suite best-of-N in one process with a
    fresh SparkSession per run, and rebuilding an identical fixture
    each run would charge fixture construction to the query being
    measured. `build(path)` must populate `path` purely from
    `sf_dir`'s read-only parquet (same inputs -> same fixture, so
    reuse cannot change results). Publication is an atomic directory
    rename gated on a `_FIXTURE_OK` marker carrying the input
    fingerprint: concurrent builders race safely (the loser discards
    its staged copy), a crashed build is invisible, and a fixture
    whose sf parquet was regenerated in place is rebuilt rather than
    served stale. Override the cache root with
    $SPARK_GRAFT_FIXTURE_DIR (e.g. to share across processes)."""
    import os
    import shutil
    import tempfile
    import uuid

    global _FIXTURE_ROOT
    root = os.environ.get("SPARK_GRAFT_FIXTURE_DIR")
    if not root:
        if _FIXTURE_ROOT is None:
            _FIXTURE_ROOT = tempfile.mkdtemp(prefix="edp-fixtures-")
        root = _FIXTURE_ROOT
    tag = sf_dir.rstrip("/").replace(os.sep, "_").strip("_")
    final = os.path.join(root, tag, name)
    fp = inputs_fingerprint(sf_dir)
    ok_path = os.path.join(final, "_FIXTURE_OK")
    try:
        with open(ok_path) as f:
            if f.read().strip() == fp:
                return final
        shutil.rmtree(final, ignore_errors=True)  # inputs changed
    except OSError:
        pass  # no fixture yet (or racing builder) — build below
    stage = f"{final}.build-{uuid.uuid4().hex}"
    import time as _time

    t0 = _time.perf_counter()
    build(stage)
    _FIXTURE_BUILD_S[0] += _time.perf_counter() - t0
    with open(os.path.join(stage, "_FIXTURE_OK"), "w") as f:
        f.write(fp)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    try:
        os.rename(stage, final)
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)  # another builder won
    return final


_FIXTURE_ROOT = None
#: cumulative wall seconds spent INSIDE fixture build() calls this
#: process — bench.py diffs it per run to attribute the run-1 vs
#: run-N spread (fixtures build once per process, so run 1 absorbs
#: all of it).
_FIXTURE_BUILD_S = [0.0]


def fixture_build_seconds() -> float:
    return _FIXTURE_BUILD_S[0]
