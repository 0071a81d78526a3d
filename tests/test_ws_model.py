"""Model-based randomized check of the M10/M11 WS-correction operator
(labels/ws_correction.py) — now load-bearing in the e2e lifecycle
fixture, where it computes the single-hop, double-hop and cycle moves.

300 seeded random label/history states run through the REAL operator
in ONE DataFrame and are compared row-by-row against a 15-line pure
python model of the documented semantics (reference lib.py:202-456):
move iff a CHECKED WS code sits in a normal scheme AND the WS scheme
carries a CHECKED code that maps to a dataset; unmapped targets
refuse; a target already in previous_datasets triggers the M11 reset
(first previous restored, history emptied); every move clears labels;
the move history is appended set-wise (array_union semantics).
"""

from __future__ import annotations

import datetime as dt
import random

from engagement_data_pipeline_spark.labels.schema import MESSAGE_SCHEMA
from engagement_data_pipeline_spark.labels.ws_correction import (
    WS_SCHEME_ID,
    apply_ws_correction,
)

T = dt.datetime(2024, 1, 10)
NORMAL = ["s_a", "s_b"]
CODE_MAP = {"w1": "d1", "w2": "d2"}
DATASETS = ["d0", "d1", "d2"]


def _model(dataset, prev, labels):
    def latest(scheme):
        for lab in labels:
            if lab[0] == scheme:
                return lab
        return None

    has_ws = False
    for s in NORMAL:
        lab = latest(s)
        if lab is not None and lab[3] and lab[1] == "WS":
            has_ws = True
    ws = latest(WS_SCHEME_ID)
    moving = has_ws and ws is not None and ws[3]
    target = CODE_MAP.get(ws[1]) if moving else None
    if not moving or target is None:
        return dataset, list(prev), list(labels)
    if target in prev:
        return prev[0], [], []          # M11 cycle reset
    new_prev = list(prev)
    if dataset not in new_prev:          # array_union is set-wise
        new_prev.append(dataset)
    return target, new_prev, []


def _random_row(rng, i):
    dataset = rng.choice(DATASETS)
    prev = rng.sample(DATASETS, rng.randint(0, 2))
    labels = []
    for _ in range(rng.randint(0, 3)):
        scheme = rng.choice(NORMAL + [WS_SCHEME_ID])
        if scheme == WS_SCHEME_ID:
            code = rng.choice(["w1", "w2", "w_unmapped"])
        else:
            # bias toward WS so the move branch fires often
            code = rng.choice(["WS", "WS", "code_x", "code_y"])
        labels.append((scheme, code, T, rng.random() < 0.7, "o"))
    return (f"m{i}", "p1", "txt", T, "in", "op", "live", dataset,
            prev, labels, (f"o-m{i}", "t"), "sha", T)


def test_ws_correction_matches_model_over_random_states(spark):
    rng = random.Random(1337)
    rows = [_random_row(rng, i) for i in range(600)]
    df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
    got = {r.message_id: r for r in
           apply_ws_correction(df, NORMAL, CODE_MAP).collect()}
    assert len(got) == 600

    moved = 0
    cycles = 0
    for row in rows:
        mid, dataset, prev, labels = row[0], row[7], row[8], row[9]
        want_ds, want_prev, want_labels = _model(dataset, prev, labels)
        out = got[mid]
        assert out.dataset == want_ds, (mid, row, out)
        assert list(out.previous_datasets) == want_prev, (mid, row, out)
        got_labels = [(l.scheme_id, l.code_id, l.checked)
                      for l in out.labels]
        want_flat = [(l[0], l[1], l[3]) for l in want_labels]
        assert got_labels == want_flat, (mid, row, out)
        if want_ds != dataset or want_prev != list(prev):
            moved += 1
            if want_prev == [] and prev:
                cycles += 1
    # the seed actually exercises the interesting branches
    assert moved > 20 and cycles > 3, (moved, cycles)
