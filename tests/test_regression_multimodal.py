"""R1-R4 regression pipeline + multimodal plumbing + K6/K7/K9 sinks."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.analysis.regression import (
    build_model_matrix,
    logistic_regression_report,
    multiple_imputation_report,
    to_factor_frame,
)
from engagement_data_pipeline_spark.labels.config import (
    AnalysisConfig,
    CodingConfig,
    DatasetConfig,
    DEMOGRAPHIC,
    RESEARCH_QUESTION_ANSWER,
)
from engagement_data_pipeline_spark.sinks.sync_back import (
    advert_sync_batch,
    contact_fields,
    facebook_metrics,
)
from engagement_data_pipeline_spark.training.multimodal import (
    decode_image,
    frame_sample_plan,
    image_features,
    MEDIA_SCHEMA,
)

CONFIG = AnalysisConfig(datasets=(
    DatasetConfig("gender", DEMOGRAPHIC, "gender_raw",
                  (CodingConfig("gender_scheme", "gender_codes"),)),
    DatasetConfig("s01e01", RESEARCH_QUESTION_ANSWER, "s01e01_raw",
                  (CodingConfig("theme_scheme", "theme_codes"),)),
))


@pytest.fixture()
def pv(spark):
    return spark.createDataFrame(
        [("p1", "false", "m", "g_m", "yes", "t1;t2"),
         ("p2", "false", "f", "g_f", "no", "t2"),
         ("p3", "false", "", "NIC;TM", "eh", "t1"),   # 0 normals → kept
         ("p4", "false", "x", "g_m;g_f", "na", "t1"),  # 2 normals → dropped
         ("p5", "true", "m", "g_m", "s", "t1")],       # withdrawn → dropped
        "participant_uuid string, consent_withdrawn string, gender_raw string, "
        "gender_codes string, s01e01_raw string, theme_codes string")


def test_r1_model_matrix(spark, pv):
    mm = build_model_matrix(pv, CONFIG, {"theme_codes": ["t1", "t2"]},
                            ["gender_codes"])
    rows = {r.participant_uuid: r for r in mm.collect()}
    assert set(rows) == {"p1", "p2", "p3"}
    assert rows["p1"].theme_t1 == 1 and rows["p1"].theme_t2 == 1
    assert rows["p2"].theme_t1 == 0 and rows["p2"].theme_t2 == 1
    assert rows["p1"].gender == "g_m"
    assert rows["p3"].gender == "missing"   # controls only → missing


def test_r2_logistic_regression_report(spark, pv):
    mm = build_model_matrix(pv, CONFIG, {"theme_codes": ["t1", "t2"]},
                            ["gender_codes"])
    rep = logistic_regression_report(mm, "theme_t1", ["gender"])
    rows = {r.feature: r.coefficient for r in rep.collect()}
    assert "(intercept)" in rows
    assert all(isinstance(v, float) for v in rows.values())


def test_r3_multiple_imputation_pools(spark, pv):
    mm = build_model_matrix(pv, CONFIG, {"theme_codes": ["t1", "t2"]},
                            ["gender_codes"])
    rep = multiple_imputation_report(mm, "theme_t1", ["gender"], m=3)
    rows = rep.collect()
    assert all(r.m == 3 for r in rows)


def test_r4_factor_frame(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "x long, s string")
    pdf = to_factor_frame(df)
    assert str(pdf["x"].dtype) == "category"
    assert pdf["s"].isna().sum() == 1


# --- multimodal ----------------------------------------------------------

def test_decode_image_requires_fake_without_codec():
    from engagement_data_pipeline_spark.training.multimodal import (
        _pil_image,
    )
    if _pil_image() is None:
        with pytest.raises(NotImplementedError):
            decode_image(b"abc")
    out = decode_image(b"abc", fake=True)
    assert out["n_bytes"] == 3
    assert out == decode_image(b"abc", fake=True)  # deterministic


def test_decode_image_real_path_with_pil(spark):
    """Exercises the real codec branch where PIL is installed (skipped
    in codec-less containers): a tiny generated PNG round-trips through
    decode_image AND the mapInPandas kernel with fake=False."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    im = PIL.new("RGB", (3, 2), (10, 20, 30))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    payload = buf.getvalue()

    out = decode_image(payload)
    assert out["n_bytes"] == len(payload)
    assert (out["width"], out["height"]) == (3, 2)
    assert out == decode_image(payload)  # deterministic

    from engagement_data_pipeline_spark.training.multimodal import (
        image_features,
    )
    media = spark.createDataFrame(
        [("i1", "image", "image/png", payload, 3, 2, None)], MEDIA_SCHEMA)
    rows = image_features(media, target=(64, 64), fake=False).collect()
    assert rows[0].n_bytes == len(payload)
    assert rows[0].feat_hash == out["feat_hash"]


def test_image_features_batch_shape(spark):
    rows = [("i1", "image", "image/jpeg", b"\x01\x02\x03", 10, 10, None),
            ("v1", "video", "video/mp4", b"\x04", 10, 10, 5000)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = image_features(media, target=(64, 64)).collect()
    assert len(out) == 1                      # only the image row
    assert out[0].media_id == "i1"
    assert out[0].n_bytes == 3
    assert out[0].out_width == 64


def test_frame_sample_plan(spark):
    rows = [("v1", "video", "video/mp4", b"", None, None, 2500),
            ("i1", "image", "image/jpeg", b"", 1, 1, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    plan = frame_sample_plan(media, every_ms=1000).collect()
    assert [(r.media_id, r.frame_ts_ms) for r in sorted(plan, key=lambda r: r.frame_ts_ms)] == \
        [("v1", 0), ("v1", 1000), ("v1", 2000)]


# --- sync-back sinks -----------------------------------------------------

T0 = dt.datetime(2024, 1, 10)


def test_k6_contact_fields_format(spark):
    rows = [("m1", "p1", "hi", T0, "s01e01", []),
            ("m2", "p1", "again", T0 + dt.timedelta(minutes=1), "s01e01", []),
            ("m3", "p2", "stop it", T0, "s01e01",
             [("theme_scheme", "STOP", T0, True, "t")])]
    df = spark.createDataFrame(
        rows, "message_id string, participant_uuid string, text string, "
        "timestamp timestamp, dataset string, labels array<struct<"
        "scheme_id:string,code_id:string,date_time_utc:timestamp,"
        "checked:boolean,origin_id:string>>")
    out = {r.participant_uuid: r for r in
           contact_fields(df, ["s01e01"]).collect()}
    assert out["p1"].field_s01e01 == '"hi" - engagement_db.s01e01; "again" - engagement_db.s01e01'
    assert out["p1"].consent_withdrawn == ""
    assert out["p2"].consent_withdrawn == "yes"


def test_k7_advert_sync_batch(spark):
    advert = spark.createDataFrame([("p1",), ("p2",)], "participant_uuid string")
    synced = spark.createDataFrame([("p1",)], "participant_uuid string")
    uuids = spark.createDataFrame([("p2", "tel:+2547002")],
                                  "participant_uuid string, urn string")
    out = advert_sync_batch(advert, synced, uuids).collect()
    assert [(r.participant_uuid, r.urn) for r in out] == [("p2", "tel:+2547002")]


def test_k9_facebook_metrics_ordered(spark):
    comments = spark.createDataFrame(
        [(1, "post1", 7), (2, "post1", 8), (3, "post2", 7)],
        "comment_id long, post_id string, from_id long")
    posts = spark.createDataFrame(
        [("post2", "pageA", "s01e01", T0),
         ("post1", "pageA", "s01e01", T0 - dt.timedelta(days=1)),
         ("post3", "pageB", "s01e02", T0)],
        "post_id string, page string, dataset string, created_time timestamp")
    out = facebook_metrics(comments, posts).collect()
    assert [r.post_id for r in out] == ["post1", "post2", "post3"]
    assert out[0].n_comments == 2 and out[0].n_commenters == 2
    assert out[2].n_comments == 0


@pytest.fixture()
def golden_mm(spark):
    """Fixed 40-row model matrix for the R2/R3 numeric goldens: theme
    depends on gender and age; every third participant's gender is
    'missing' so R3 actually imputes."""
    rows = []
    for i in range(40):
        gender = ["man", "woman", "missing"][i % 3]
        age = ["18_24", "25_34"][i % 2]
        y = 1 if (i % 3 == 0 and i % 2 == 0) or i % 7 == 0 else 0
        rows.append((f"uuid-{i:03d}", y, gender, age))
    return spark.createDataFrame(
        rows, "participant_uuid string, theme int, gender string, age string")


def test_r2_golden_coefficients(spark, golden_mm):
    """Pins the IRLS fit's exact values (tolerance 1e-9) so a refactor
    cannot silently change the fitted coefficients while the rows-only
    driver check keeps passing. The fit is bit-deterministic: grouped
    cells are sorted before any float accumulates."""
    from engagement_data_pipeline_spark.analysis.regression import (
        logistic_regression_report,
    )
    got = {r.feature: r.coefficient
           for r in logistic_regression_report(
               golden_mm, "theme", ["gender", "age"]).collect()}
    expected = {
        "(intercept)": -2.240822098595421,
        "age=18_24": 1.4334012927761293,
        "gender=man": 1.6361523723600342,
        "gender=missing": -0.32702534218581336,
    }
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_r3_golden_pooled_coefficients(spark, golden_mm):
    """Same pin for the MICE-lite pooled point estimates; after
    imputation the 'missing' gender level disappears, so the feature
    set shrinks to the observed categories."""
    from engagement_data_pipeline_spark.analysis.regression import (
        multiple_imputation_report,
    )
    got = {r.feature: (r.pooled_coefficient, r.m)
           for r in multiple_imputation_report(
               golden_mm, "theme", ["gender", "age"], m=3).collect()}
    expected = {
        "(intercept)": -2.2359692826755335,
        "age=18_24": 1.2858377328709443,
        "gender=man": 1.114097701801925,
    }
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k][1] == 3
        assert abs(got[k][0] - v) < 1e-9, (k, got[k][0], v)
