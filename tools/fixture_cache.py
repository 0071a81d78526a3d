"""Content-keyed persistent fixture cache root.

`queries/_helpers.fixture_dir` builds are PURE functions of (package
source, sf parquet): same code + same inputs -> byte-identical
fixture semantics. That makes a cache keyed by the source tree's
hash safe to reuse across processes and rounds — a warm box makes
bench run 1 ≈ runs 2-3 instead of absorbing hundreds of seconds of
fixture construction (VERDICT r12 task 2), and repeated
check_correctness invocations stop rebuilding the e2e/MV/index
fixtures from scratch. Any source change flips the key and rebuilds;
stale keys are pruned so the cache never holds more than one code
version.
"""

from __future__ import annotations

import hashlib
import os
import shutil

_DEFAULT_BASE = "/tmp/spark-graft-fixture-cache"


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


def content_keyed_fixture_root() -> str:
    """The cache dir for the CURRENT source tree, creating it and
    pruning other (stale-code) keys. Honors $SPARK_GRAFT_FIXTURE_CACHE
    as the base directory."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.environ.get("SPARK_GRAFT_FIXTURE_CACHE", _DEFAULT_BASE)
    key = _source_key(repo_root)
    root = os.path.join(base, key)
    os.makedirs(root, exist_ok=True)
    for d in os.listdir(base):
        if d != key:
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    return root


def default_fixture_env() -> str:
    """Point $SPARK_GRAFT_FIXTURE_DIR at the content-keyed cache
    unless the caller already pinned one. Returns the active root."""
    root = os.environ.get("SPARK_GRAFT_FIXTURE_DIR")
    if not root:
        root = content_keyed_fixture_root()
        os.environ["SPARK_GRAFT_FIXTURE_DIR"] = root
    return root
