"""Content-keyed persistent fixture cache root.

`queries/_helpers.fixture_dir` builds are PURE functions of (package
source, sf parquet): same code + same inputs -> byte-identical
fixture semantics. That makes a cache keyed by the source tree's
hash safe to reuse across processes and rounds — a warm box makes
bench run 1 ≈ runs 2-3 instead of absorbing hundreds of seconds of
fixture construction (VERDICT r12 task 2), and repeated
check_correctness invocations stop rebuilding the e2e/MV/index
fixtures from scratch. Any source change flips the key and rebuilds.

Pruning is IDLE-BASED, never immediate: a sibling key is only removed
once its last-used stamp is older than a grace period (default 6h,
override $SPARK_GRAFT_FIXTURE_PRUNE_HOURS; <=0 disables). A concurrent
process on a different source version (another checkout, or a bench
still running while this tree is edited) keeps refreshing its own
stamp, so its live fixture root is never deleted mid-run. Input
staleness (regenerated sf parquet under the same path) is handled one
level down: fixture_dir stamps an input fingerprint next to
_FIXTURE_OK and rebuilds on mismatch (queries/_helpers.py).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time

_DEFAULT_BASE = "/tmp/spark-graft-fixture-cache"
#: siblings idle longer than this are pruned (hours)
_DEFAULT_PRUNE_HOURS = 6.0
_STAMP = "_LAST_USED"


def _source_key(repo_root: str) -> str:
    h = hashlib.sha256()
    srcs = [os.path.join(repo_root, "__spark_entry__.py")]
    pkg = os.path.join(repo_root, "engagement_data_pipeline_spark")
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        srcs.extend(os.path.join(dirpath, fn)
                    for fn in filenames if fn.endswith(".py"))
    for p in sorted(srcs):
        h.update(os.path.relpath(p, repo_root).encode())
        try:
            with open(p, "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(b"<unreadable>")
    return h.hexdigest()[:16]


def _touch_stamp(root: str) -> None:
    try:
        with open(os.path.join(root, _STAMP), "w") as f:
            f.write(str(time.time()))
    except OSError:
        pass


def _last_used(path: str) -> float:
    """Best-effort last-use time of a cache key dir."""
    for probe in (os.path.join(path, _STAMP), path):
        try:
            return os.stat(probe).st_mtime
        except OSError:
            continue
    return 0.0


def prune_stale_keys(base: str, current_key: str,
                     grace_hours: float | None = None) -> list[str]:
    """Remove sibling cache keys idle for longer than the grace
    period. Never touches `current_key`. Returns pruned key names
    (for the caller's log line)."""
    if grace_hours is None:
        grace_hours = float(os.environ.get(
            "SPARK_GRAFT_FIXTURE_PRUNE_HOURS", _DEFAULT_PRUNE_HOURS))
    if grace_hours <= 0:
        return []
    cutoff = time.time() - grace_hours * 3600.0
    pruned = []
    try:
        siblings = os.listdir(base)
    except OSError:
        return []
    for d in siblings:
        if d == current_key:
            continue
        path = os.path.join(base, d)
        if not os.path.isdir(path):
            continue
        if _last_used(path) < cutoff:
            shutil.rmtree(path, ignore_errors=True)
            pruned.append(d)
    return pruned


def content_keyed_fixture_root() -> str:
    """The cache dir for the CURRENT source tree, creating it,
    refreshing its last-used stamp, and pruning sibling keys that
    have been idle past the grace period. Honors
    $SPARK_GRAFT_FIXTURE_CACHE as the base directory."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.environ.get("SPARK_GRAFT_FIXTURE_CACHE", _DEFAULT_BASE)
    key = _source_key(repo_root)
    root = os.path.join(base, key)
    os.makedirs(root, exist_ok=True)
    _touch_stamp(root)
    pruned = prune_stale_keys(base, key)
    if pruned:
        print(f"[fixture-cache] pruned {len(pruned)} stale key(s): "
              + ", ".join(sorted(pruned)), flush=True)
    return root


def default_fixture_env() -> str:
    """Point $SPARK_GRAFT_FIXTURE_DIR at the content-keyed cache
    unless the caller already pinned one. Returns the active root."""
    root = os.environ.get("SPARK_GRAFT_FIXTURE_DIR")
    if not root:
        root = content_keyed_fixture_root()
        os.environ["SPARK_GRAFT_FIXTURE_DIR"] = root
    return root
