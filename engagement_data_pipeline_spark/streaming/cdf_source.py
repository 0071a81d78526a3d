"""The merge table's change feed as a STRUCTURED STREAMING SOURCE —
the Delta CDF `readChangeFeed` analog, built on PySpark 4's Python
Data Source API:

    spark.dataSource.register(MergeTableChangesDataSource)
    (spark.readStream.format("merge_table_changes")
          .option("path", table_path).load())

Offsets are commit ids from the table's own log, so the stream is
exactly the commit history: each micro-batch carries the row-level
changes (op = insert/update/delete + the new payload, NULL for
deletes) between two commits — deletion-vector commits included,
since a bucket's logical content is (version, dv). Downstream
consumers (MV refresh, index maintenance, sync-out) can therefore
subscribe to a table instead of polling `table_changes`.

Scale shape: `partitions()` emits ONE partition per changed bucket
(manifest diff only — no data touched on the driver), and each
executor task reads exactly its bucket's old + new files with
pyarrow and computes the keyed diff in Arrow/pandas — O(changed
buckets) per batch, embarrassingly parallel, no shuffle. Per-task
memory is bounded by one bucket's old + new bytes — the layout's
`TARGET_BUCKET_BYTES` sizing is what keeps that executor-safe.
Offsets are checkpointed by the engine; reads are deterministic
because version directories are immutable, so recovery replays
identical batches.

Filesystem support: local paths (tests, NFS). Object stores would
swap the `open`/listdir calls for `pyarrow.fs` — the protocol logic
is path-agnostic. The reference's analog is its Firestore
incremental fetch loop (SURVEY §2.1 S2); here the table IS the feed.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)

_LOG_DIR = "_log"
_OP, _CHANGED = "op", "changed_cols"


def _strip_file(p: str) -> str:
    return p[7:] if p.startswith("file://") else p


def _manifest(table_path: str, commit: int) -> dict | None:
    p = os.path.join(_strip_file(table_path), _LOG_DIR,
                     f"{commit:08d}.json")
    try:
        with open(p) as f:
            man = json.loads(f.read())
    except (OSError, ValueError):
        return None
    if not {"commit", "n_buckets", "origin", "buckets"} <= man.keys():
        return None
    man["buckets"] = {int(k): int(v) for k, v in man["buckets"].items()}
    return man


def _latest_commit(table_path: str) -> int | None:
    """Highest PARSEABLE commit. Scans names newest-first and stops at
    the first good manifest — this runs on every latestOffset() poll,
    so it must stay O(1) manifest reads in the common case, not
    O(commits) (only a trailing crash-partial manifest costs an extra
    read, same skip rule as the batch reader)."""
    log = os.path.join(_strip_file(table_path), _LOG_DIR)
    try:
        names = os.listdir(log)
    except OSError:
        return None
    for n in sorted(names, reverse=True):
        if not n.endswith(".json"):
            continue
        try:
            c = int(n[:-5])
        except ValueError:
            continue
        if _manifest(table_path, c) is not None:
            return c
    return None


def _bucket_dir(table_path: str, man: dict, bucket: int) -> str | None:
    ver = man["buckets"].get(bucket)
    if ver is None:
        return None
    root = man.get("bases", {}).get(str(ver), table_path)
    name = man.get("vdirs", {}).get(str(ver), f"v{ver:08d}")
    return os.path.join(_strip_file(root), name, f"bucket={bucket}")


def _dv_dir(table_path: str, man: dict, bucket: int) -> str | None:
    d = man.get("dv", {}).get(str(bucket))
    if d is None:
        return None
    root = man.get("dv_bases", {}).get(d, table_path)
    return os.path.join(_strip_file(root), d, f"bucket={bucket}")


def _changed_buckets(man_from: dict | None, man_to: dict) -> list[int]:
    old_b = man_from["buckets"] if man_from else {}
    new_b = man_to["buckets"]
    old_dv = (man_from or {}).get("dv", {})
    new_dv = man_to.get("dv", {})
    return sorted(
        b for b in set(old_b) | set(new_b)
        if (old_b.get(b), old_dv.get(str(b)))
        != (new_b.get(b), new_dv.get(str(b))))


def _read_bucket(table_path: str, man: dict | None, bucket: int,
                 columns: list[str]):
    """One bucket's dv-resolved rows as a pandas frame (executor-side
    pyarrow read — no SparkSession exists here)."""
    import pandas as pd
    import pyarrow.parquet as pq

    if man is None:
        return pd.DataFrame(columns=columns)
    d = _bucket_dir(table_path, man, bucket)
    if d is None or not os.path.isdir(d):
        return pd.DataFrame(columns=columns)
    pdf = pq.read_table(d).to_pandas()
    for c in columns:
        if c not in pdf.columns:
            pdf[c] = None
    pdf = pdf[columns]
    dv = _dv_dir(table_path, man, bucket)
    if dv is not None and os.path.isdir(dv):
        dead = pq.read_table(dv).to_pandas()
        origin = list(man["origin"])
        merged = pdf.merge(dead[origin].drop_duplicates(), on=origin,
                           how="left", indicator=True)
        pdf = (merged[merged["_merge"] == "left_only"]
               .drop(columns="_merge"))
    return pdf


class _ChangesPartition(InputPartition):
    def __init__(self, table_path: str, man_from: dict | None,
                 man_to: dict, bucket: int, columns: list[str],
                 include_old: bool):
        self.table_path = table_path
        self.man_from = man_from
        self.man_to = man_to
        self.bucket = bucket
        self.columns = columns
        self.include_old = include_old


class _ChangesReader(DataSourceStreamReader):
    def __init__(self, table_path: str, starting_commit: int,
                 columns: list[str], include_old: bool):
        self.table_path = table_path
        self.start = starting_commit
        self.columns = columns  # origin + payload (no op/changed yet)
        self.include_old = include_old

    def initialOffset(self) -> dict:
        return {"commit": self.start}

    def latestOffset(self) -> dict:
        latest = _latest_commit(self.table_path)
        return {"commit": latest if latest is not None else self.start}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["commit"]), int(end["commit"])
        if hi <= lo:
            return [_ChangesPartition(self.table_path, None, None, -1,
                                      self.columns, self.include_old)]
        man_from = _manifest(self.table_path, lo) if lo > 0 else None
        man_to = _manifest(self.table_path, hi)
        if man_to is None:
            raise ValueError(
                f"manifest {hi} of {self.table_path} is unreadable")
        return [
            _ChangesPartition(self.table_path, man_from, man_to, b,
                              self.columns, self.include_old)
            for b in _changed_buckets(man_from, man_to)
        ] or [_ChangesPartition(self.table_path, None, None, -1,
                                self.columns, self.include_old)]

    def read(self, partition: _ChangesPartition) -> Iterator[tuple]:
        import pandas as pd

        if partition.bucket < 0:  # empty batch placeholder
            return iter(())
        cols = partition.columns
        man_to = partition.man_to
        origin = list(man_to["origin"])
        payload = [c for c in cols if c not in origin]
        new = _read_bucket(partition.table_path, man_to,
                           partition.bucket, cols)
        old = _read_bucket(partition.table_path, partition.man_from,
                           partition.bucket, cols)
        j = old.merge(new, on=origin, how="outer",
                      suffixes=("__old", "__new"), indicator=True)

        def _clean(v):
            return None if pd.isna(v) else v

        inc_old = partition.include_old
        out = []
        for row in j.itertuples(index=False, name=None):
            r = dict(zip(j.columns, row))
            key = tuple(_clean(r[c]) for c in origin)
            if r["_merge"] == "right_only":
                row_out = (*key, "insert", "",
                           *[_clean(r[f"{c}__new"]) for c in payload])
                old_out = tuple(None for _ in payload)
            elif r["_merge"] == "left_only":
                row_out = (*key, "delete", "", *[None for _ in payload])
                old_out = tuple(_clean(r[f"{c}__old"]) for c in payload)
            else:
                changed = [c for c in payload
                           if _clean(r[f"{c}__old"])
                           != _clean(r[f"{c}__new"])]
                if not changed:
                    continue
                row_out = (*key, "update", ",".join(sorted(changed)),
                           *[_clean(r[f"{c}__new"]) for c in payload])
                old_out = tuple(_clean(r[f"{c}__old"]) for c in payload)
            out.append(row_out + old_out if inc_old else row_out)
        return iter(out)

    def commit(self, end: dict) -> None:
        pass


class MergeTableChangesDataSource(DataSource):
    """`format("merge_table_changes")` — stream a versioned merge
    table's row-level changes. Options: `path` (table root, required);
    `startingCommit` (default 0 = replay the whole history as
    inserts); `includeOld` ("true"/"false", default false) appends a
    `<col>__old` column per payload column carrying the PRE-change
    value on updates and deletes — the retract-stream shape (Flink's
    changelog idiom) that lets a downstream incremental consumer
    SUBTRACT without ever consulting the source table."""

    @classmethod
    def name(cls) -> str:
        return "merge_table_changes"

    def _table_path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("option 'path' (table root) is required")
        return path

    def _columns_and_types(self) -> list[tuple[str, str]]:
        import pyarrow.parquet as pq

        path = self._table_path()
        latest = _latest_commit(path)
        if latest is None:
            raise ValueError(f"{path} has no commits")
        man = _manifest(path, latest)
        origin = list(man["origin"])
        for b in sorted(man["buckets"]):
            d = _bucket_dir(path, man, b)
            if d and os.path.isdir(d):
                schema = pq.read_schema(
                    os.path.join(d, sorted(
                        n for n in os.listdir(d)
                        if n.endswith(".parquet"))[0]))
                break
        else:
            raise ValueError(f"{path} has no data files")
        _ARROW_TO_DDL = {"string": "string", "large_string": "string",
                         "int64": "long", "int32": "int",
                         "double": "double", "float": "float",
                         "bool": "boolean",
                         "timestamp[us]": "timestamp",
                         "timestamp[ns]": "timestamp",
                         "date32[day]": "date"}
        fields = []
        for f in schema:
            t = _ARROW_TO_DDL.get(str(f.type))
            if t is None:
                raise ValueError(
                    f"column {f.name}: arrow type {f.type} not mapped "
                    "for the changes source")
            fields.append((f.name, t))
        # origin columns first, then op/changed_cols, then payload
        by_name = dict(fields)
        ordered = ([(c, by_name[c]) for c in origin]
                   + [(_OP, "string"), (_CHANGED, "string")]
                   + [(n, t) for n, t in fields if n not in origin])
        return ordered

    def _include_old(self) -> bool:
        return str(self.options.get("includeOld", "false")).lower() == "true"

    def schema(self) -> str:
        cols = self._columns_and_types()
        ddl = ", ".join(f"{n} {t}" for n, t in cols)
        if self._include_old():
            # payload columns = everything after op/changed_cols
            tail = cols[[n for n, _t in cols].index(_CHANGED) + 1:]
            ddl += ", " + ", ".join(f"{n}__old {t}" for n, t in tail)
        return ddl

    def streamReader(self, schema) -> _ChangesReader:
        cols = [n for n, _t in self._columns_and_types()
                if n not in (_OP, _CHANGED)]
        return _ChangesReader(
            self._table_path(),
            int(self.options.get("startingCommit", 0)),
            cols, self._include_old())
