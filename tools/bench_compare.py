"""Compare this round's bench per-query MINIMA against a previous
round's artifact: the per-query MIN is the noise-floor estimator
(host contention only inflates), so MIN regressions are code, MAX
swings are host noise — the mechanical drift separation VERDICT r11
asked for.

Usage: python tools/bench_compare.py BENCH_LOCAL.json BENCH_r11.json [ratio]
Prints every query whose MIN regressed beyond `ratio` (default 1.2).
Both sides prefer `queries_spread` minima (true per-query minima
across all runs, artifacts ≥ r12); an artifact without spreads falls
back to its best-RUN per-query times, which minimize the TOTAL, not
each query — a weaker baseline, so the tool notes when it's in play.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    new_path, old_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    new = json.load(open(new_path))
    old = json.load(open(old_path))
    # driver artifacts (BENCH_r{N}.json) wrap the bench line in "parsed"
    new = new.get("parsed", new)
    old = old.get("parsed", old)
    def minima(art: dict) -> tuple[dict, bool]:
        spread = {k: lo for k, (lo, _hi) in
                  art.get("queries_spread", {}).items()}
        if spread:
            return spread, True
        return {k: v for k, v in art["queries"].items()
                if v is not None}, False

    new_min, new_spread = minima(new)
    old_min, old_spread = minima(old)
    if not old_spread:
        print("note: old artifact has no queries_spread — comparing "
              "against its best-RUN times (per-query upper bound of "
              "that round's minima)")
    if not new_spread:
        print("note: new artifact has no queries_spread — comparing "
              "its best-RUN times")
    shared = sorted(set(new_min) & set(old_min))
    regressed = [(k, old_min[k], new_min[k],
                  round(new_min[k] / old_min[k], 2))
                 for k in shared
                 if old_min[k] > 0 and new_min[k] / old_min[k] > ratio
                 and new_min[k] - old_min[k] > 0.3]  # ignore sub-noise
    total_old = sum(old_min[k] for k in shared)
    total_new = sum(new_min[k] for k in shared)
    print(f"shared queries: {len(shared)}  old-min total: "
          f"{total_old:.1f}s  new-min total: {total_new:.1f}s  "
          f"ratio: {total_new / total_old:.3f}")
    if regressed:
        print(f"MIN regressions > {ratio}x (and > 0.3s absolute):")
        for k, o, n, r in sorted(regressed, key=lambda t: -t[3]):
            print(f"  {k}: {o:.2f}s -> {n:.2f}s ({r}x)")
    else:
        print(f"no per-query MIN regression > {ratio}x")


if __name__ == "__main__":
    main()
