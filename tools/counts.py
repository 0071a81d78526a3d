"""Derive the true query/family/test counts and check the prose that
cites them — kills the README/STATUS/registry count drift for good.

Usage:
    python tools/counts.py            # print derived counts
    python tools/counts.py --check    # exit 1 if README.md disagrees

Sources of truth:
* registry counts import straight from `queries.registry` /
  `queries.family_defs` (no Spark session needed);
* the test count comes from pytest collection (`--collect-only -q`),
  skipped when pytest collection itself fails.

`--check` greps README.md for the patterns "(N queries)", "M members"
and "# T tests" and compares them to the derived numbers, so a stale
doc fails the gate instead of shipping.
"""

from __future__ import annotations

import re
import subprocess
import sys


def derived_counts() -> dict:
    sys.path.insert(0, ".")
    from engagement_data_pipeline_spark.queries import registry
    from engagement_data_pipeline_spark.queries import family_defs

    members = (len(family_defs._EVENTS_MEMBERS)
               + len(family_defs._TRAINING_MEMBERS)
               + len(family_defs._SIMILARITY_MM_MEMBERS))
    rows_only = sorted(set(registry.QUERIES) - set(registry.ORACLES))
    # every rows-only query must name an oracle-backed certifying twin
    cert = registry.ROWS_ONLY_CERTIFIED_BY
    if sorted(cert) != rows_only:
        raise SystemExit(
            f"ROWS_ONLY_CERTIFIED_BY keys {sorted(cert)} != rows-only "
            f"set {rows_only} — every rows-only query needs a "
            "hash-certified twin (registry.ROWS_ONLY_CERTIFIED_BY)")
    missing = [f"{q} -> {t}" for q, t in cert.items()
               if t not in registry.ORACLES]
    if missing:
        raise SystemExit(
            f"certifying twins not oracle-backed: {missing}")
    return {
        "queries": len(registry.QUERIES),
        "oracle_backed": len(registry.ORACLES),
        "rows_only": rows_only,
        "family_members": members,
    }


def collected_tests() -> int | None:
    try:
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only",
             "-q", "--no-header"],
            capture_output=True, text=True, timeout=300)
        m = re.search(r"(\d+) tests collected", out.stdout)
        return int(m.group(1)) if m else None
    except Exception:
        return None


def main() -> int:
    counts = derived_counts()
    n_tests = collected_tests()
    counts["tests_collected"] = n_tests
    for k, v in counts.items():
        print(f"{k}: {v}")
    if "--check" not in sys.argv:
        return 0

    readme = open("README.md").read()
    failures = []

    def expect(pattern: str, actual: int, label: str) -> None:
        m = re.search(pattern, readme)
        if m and int(m.group(1)) != actual:
            failures.append(
                f"README.md says {m.group(0)!r} but {label} is {actual}")

    expect(r"\((\d+) queries\)", counts["queries"], "registry size")
    expect(r"(\d+) members", counts["family_members"], "family membership")
    if n_tests is not None:
        expect(r"# (\d+) tests", n_tests, "pytest collection")
    if failures:
        print("\nCOUNT DRIFT:", *failures, sep="\n  ")
        return 1
    print("\ncounts in README.md match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
