"""Analysis configuration: datasets, coding configs, control codes.

Mirrors the reference's PipelineConfiguration surface
(src/engagement_db_to_analysis/configuration.py:13-124): each logical
dataset is demographic or RQA and carries one or more coding configs
(code scheme + output column). The synthetic config below matches the
fixture derivation in sources/synthetic.py; both the Spark plans and
the DuckDB oracle SQL are *generated from this object*, so the two
engines can't drift.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Control codes (reference CodeScheme ControlCode values, SURVEY §1.3)
NOT_REVIEWED = "NR"
CODING_ERROR = "CE"
NOT_CODED = "NC"
TRUE_MISSING = "TM"
NOT_INTERNALLY_CONSISTENT = "NIC"
STOP = "STOP"
WS = "WS"

CONTROL_CODES = [NOT_REVIEWED, CODING_ERROR, NOT_CODED, TRUE_MISSING,
                 NOT_INTERNALLY_CONSISTENT, STOP, WS]

DEMOGRAPHIC = "demographic"
RESEARCH_QUESTION_ANSWER = "rqa"

# Age-category buckets (reference code_imputation_functions.py:316-322;
# ranges inclusive both ends, config §2.6 M4)
AGE_BUCKETS = [
    (10, 14, "age_10_to_14"),
    (15, 17, "age_15_to_17"),
    (18, 35, "age_18_to_35"),
    (36, 54, "age_36_to_54"),
    (55, 99, "age_55_plus"),
]


@dataclass(frozen=True)
class CodingConfig:
    scheme_id: str
    coded_field: str          # output column in the column views
    # scheme whose codes M4 derives from (age_category only)
    age_category_source: str | None = None
    # M5 location hierarchy: scheme whose Normal codes this level is
    # derived from, plus the (source_code -> level_code) mapping —
    # the broadcast hierarchy dimension (reference
    # code_imputation_functions.py:342-524, hierarchy data lives in
    # CoreDataModules' location tables).
    location_source: str | None = None
    location_map: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class DatasetConfig:
    name: str                 # engagement-db dataset
    dataset_type: str         # demographic | rqa
    raw_field: str            # raw-text output column
    coding_configs: tuple[CodingConfig, ...]

    @property
    def scheme_ids(self) -> list[str]:
        return [cc.scheme_id for cc in self.coding_configs]


@dataclass(frozen=True)
class AnalysisConfig:
    datasets: tuple[DatasetConfig, ...]
    test_participants: tuple[str, ...] = ()
    rqa_start: str | None = None
    rqa_end: str | None = None

    @property
    def rqa_datasets(self) -> list[str]:
        return [d.name for d in self.datasets if d.dataset_type == RESEARCH_QUESTION_ANSWER]

    @property
    def demog_datasets(self) -> list[str]:
        return [d.name for d in self.datasets if d.dataset_type == DEMOGRAPHIC]

    def dataset(self, name: str) -> DatasetConfig:
        return next(d for d in self.datasets if d.name == name)


# Synthetic location hierarchy (M5): 7 location codes roll up into 4
# counties and 3 regions — the Kenya ward→constituency→county shape.
LOCATION_COUNTY_MAP = tuple((f"code_{i}", f"county_{i // 2}") for i in range(7))
LOCATION_REGION_MAP = tuple((f"code_{i}", f"region_{i // 3}") for i in range(7))

SYNTHETIC_CONFIG = AnalysisConfig(
    datasets=(
        DatasetConfig("gender", DEMOGRAPHIC, "gender_raw",
                      (CodingConfig("gender_scheme", "gender_codes"),)),
        DatasetConfig("age", DEMOGRAPHIC, "age_raw",
                      (CodingConfig("age_scheme", "age_codes"),
                       CodingConfig("age_category_scheme", "age_category_codes",
                                    age_category_source="age_scheme"))),
        DatasetConfig("location", DEMOGRAPHIC, "location_raw",
                      (CodingConfig("location_scheme", "location_codes"),
                       CodingConfig("location_county_scheme", "location_county_codes",
                                    location_source="location_scheme",
                                    location_map=LOCATION_COUNTY_MAP),
                       CodingConfig("location_region_scheme", "location_region_codes",
                                    location_source="location_scheme",
                                    location_map=LOCATION_REGION_MAP))),
        DatasetConfig("s01e01", RESEARCH_QUESTION_ANSWER, "s01e01_raw",
                      (CodingConfig("s01e01_theme_scheme", "s01e01_theme_codes"),
                       CodingConfig("s01e01_sentiment_scheme", "s01e01_sentiment_codes"))),
        DatasetConfig("s01e02", RESEARCH_QUESTION_ANSWER, "s01e02_raw",
                      (CodingConfig("s01e02_theme_scheme", "s01e02_theme_codes"),
                       CodingConfig("s01e02_sentiment_scheme", "s01e02_sentiment_codes"))),
    ),
    test_participants=("avf-participant-uuid-0", "avf-participant-uuid-1"),
    rqa_start="2024-01-05 00:00:00",
    rqa_end="2024-01-25 00:00:00",
)
