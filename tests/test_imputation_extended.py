"""Tests for M2 (WS coding error), M5 (location hierarchy), M9 (zone
from operator), M12 (auto-coding), M13 (label validation), and the
CodeScheme loader."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.labels.config import (
    AnalysisConfig,
    CodingConfig,
    DatasetConfig,
    DEMOGRAPHIC,
    RESEARCH_QUESTION_ANSWER,
)
from engagement_data_pipeline_spark.labels.imputation import (
    WS_CORRECT_DATASET_SCHEME,
    impute_message_grain,
    impute_zone_from_operator,
)
from engagement_data_pipeline_spark.labels.schema import MESSAGE_SCHEMA
from engagement_data_pipeline_spark.labels.schemes import (
    CodeScheme,
    auto_code,
    invalid_labels,
)

T0 = dt.datetime(2024, 1, 10)

CONFIG = AnalysisConfig(datasets=(
    DatasetConfig("location", DEMOGRAPHIC, "location_raw",
                  (CodingConfig("location_scheme", "location_codes"),
                   CodingConfig("county_scheme", "county_codes",
                                location_source="location_scheme",
                                location_map=(("loc_a", "county_1"),
                                              ("loc_b", "county_1"),
                                              ("loc_c", "county_2"))),)),
    DatasetConfig("s01e01", RESEARCH_QUESTION_ANSWER, "s01e01_raw",
                  (CodingConfig("theme_scheme", "theme_codes"),)),
))


def label(scheme, code, checked=True):
    return (scheme, code, T0, checked, "t")


def msg(mid, dataset, text, labels, operator="telegram"):
    return (mid, "p1", text, T0, "in", operator, "live", dataset,
            [], labels, ("o-" + mid, "t"), "sha", T0)


def run(spark, rows, config=CONFIG):
    df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
    return {r["message_id"]: r for r in impute_message_grain(df, config).collect()}


def codes(row, scheme):
    return [l["code_id"] for l in row["labels"] if l["scheme_id"] == scheme]


# --- M2 -------------------------------------------------------------------

def test_m2_ws_in_normal_without_ws_scheme_label_is_ce(spark):
    out = run(spark, [msg("m1", "s01e01", "hi", [label("theme_scheme", "WS")])])
    assert codes(out["m1"], "theme_scheme") == ["CE"]


def test_m2_ws_scheme_label_without_ws_code_is_ce(spark):
    # all-checked normal label + checked WS-scheme label, but no WS
    # code in the normal scheme → XOR → CE
    out = run(spark, [msg("m1", "s01e01", "hi",
                          [label("theme_scheme", "t1"),
                           label(WS_CORRECT_DATASET_SCHEME, "ws_gender")])])
    assert codes(out["m1"], "theme_scheme") == ["CE"]


def test_m2_both_sides_present_is_not_an_error(spark):
    # WS in normal + WS-scheme label = the M10 move path, not CE
    out = run(spark, [msg("m1", "s01e01", "hi",
                          [label("theme_scheme", "WS"),
                           label(WS_CORRECT_DATASET_SCHEME, "ws_gender")])])
    assert codes(out["m1"], "theme_scheme") == ["WS"]


def test_m2_unreviewed_message_with_ws_scheme_label_is_ce_not_nr(spark):
    # none-checked normals (M1 → NR) but a checked WS-scheme label
    # survives M1 → M2 XOR fires → CE (sequential semantics)
    out = run(spark, [msg("m1", "s01e01", "hi",
                          [label("theme_scheme", "t1", checked=False),
                           label(WS_CORRECT_DATASET_SCHEME, "ws_gender")])])
    assert codes(out["m1"], "theme_scheme") == ["CE"]


# --- M5 -------------------------------------------------------------------

def test_m5_location_hierarchy_derivation(spark):
    out = run(spark, [msg("m1", "location", "somewhere",
                          [label("location_scheme", "loc_c")])])
    assert codes(out["m1"], "county_scheme") == ["county_2"]
    assert codes(out["m1"], "location_scheme") == ["loc_c"]


def test_m5_controls_propagate_not_derive(spark):
    out = run(spark, [msg("m1", "location", "somewhere",
                          [label("location_scheme", "loc_a", checked=False)])])
    assert codes(out["m1"], "location_scheme") == ["NR"]
    assert codes(out["m1"], "county_scheme") == ["NR"]


# --- M9 -------------------------------------------------------------------

def test_m9_zone_from_operator_overrides_nc(spark):
    rows = [msg("m1", "location", "?", [label("zone_scheme", "NC")],
                operator="golis"),
            msg("m2", "location", "?", [label("zone_scheme", "zone_x")],
                operator="golis")]
    df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
    out = {r["message_id"]: r for r in impute_zone_from_operator(
        df, "zone_scheme", {"golis": "puntland"}).collect()}
    assert codes(out["m1"], "zone_scheme")[0] == "puntland"  # NC overridden
    assert codes(out["m2"], "zone_scheme") == ["zone_x"]     # normal untouched


# --- CodeScheme / M12 / M13 ----------------------------------------------

SCHEME = CodeScheme.from_dict({
    "SchemeID": "gender_scheme",
    "Name": "Gender",
    "Codes": [
        {"CodeID": "g_male", "CodeType": "Normal", "StringValue": "male",
         "MatchValues": ["male", "m", "mwanaume"]},
        {"CodeID": "g_female", "CodeType": "Normal", "StringValue": "female",
         "MatchValues": ["female", "f"]},
        {"CodeID": "NR", "CodeType": "Control", "ControlCode": "NR"},
    ],
})


def test_code_scheme_loader():
    assert SCHEME.scheme_id == "gender_scheme"
    assert SCHEME.code_ids() == {"g_male", "g_female", "NR"}
    assert SCHEME.code_for_match_value("mwanaume").code_id == "g_male"
    assert SCHEME.code_for_match_value("nope") is None


def test_m12_auto_code_suggests_unchecked(spark):
    rows = [msg("m1", "gender", "Male", []),
            msg("m2", "gender", "unknown thing", []),
            msg("m3", "gender", "f", [label("gender_scheme", "g_male")])]
    df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
    out = {r["message_id"]: r for r in auto_code(df, SCHEME).collect()}
    sug = [l for l in out["m1"]["labels"] if l["scheme_id"] == "gender_scheme"]
    assert sug[0]["code_id"] == "g_male" and sug[0]["checked"] is False
    assert out["m2"]["labels"] == []              # no match → no label
    assert len(out["m3"]["labels"]) == 1          # already labelled → untouched


def test_m13_invalid_labels_detected(spark):
    rows = [msg("m1", "gender", "x", [label("gender_scheme", "g_male")]),
            msg("m2", "gender", "x", [label("gender_scheme", "bogus")]),
            msg("m3", "gender", "x", [label("unknown_scheme", "g_male")]),
            msg("m4", "gender", "x", [label("gender_scheme", "SPECIAL-MANUALLY_UNCODED")])]
    df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
    bad = invalid_labels(df, {"gender_scheme": SCHEME.code_ids()})
    assert sorted(r["message_id"] for r in bad.collect()) == ["m2", "m3"]
