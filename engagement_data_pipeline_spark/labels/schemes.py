"""CodeScheme loading (SURVEY §1.3) and auto-coding / validation
(§2.6 M12/M13).

Reference: code_schemes/*.json documents with `SchemeID`, `Name`,
`Version`, and `Codes[]`, each code carrying `CodeID`,
`CodeType ∈ {Normal, Control, Meta}`, `ControlCode`, `DisplayText`,
`NumericValue`, `StringValue`, `MatchValues[]`
(code_schemes/gender.json:1-90). Schemes are config-sized, so they
live driver-side and broadcast into expressions — never a data-sized
join.

M12 (lib.py:165-173): an unlabelled message entering Coda gets an
auto-coder suggestion — the text is matched against every code's
MatchValues; a hit yields an UNCHECKED label (humans confirm later).
M13 (lib.py:147-163): labels synced to Coda must reference a known
scheme and code id.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schema import make_label


@dataclass(frozen=True)
class Code:
    code_id: str
    code_type: str = "Normal"            # Normal | Control | Meta
    control_code: str | None = None
    display_text: str = ""
    string_value: str = ""
    numeric_value: int | None = None
    match_values: tuple[str, ...] = ()


@dataclass(frozen=True)
class CodeScheme:
    scheme_id: str
    name: str = ""
    version: str = ""
    codes: tuple[Code, ...] = ()

    def code_ids(self) -> set[str]:
        return {c.code_id for c in self.codes}

    def code_for_match_value(self, value: str) -> Code | None:
        for c in self.codes:
            if value in c.match_values:
                return c
        return None

    @staticmethod
    def from_dict(d: dict) -> "CodeScheme":
        codes = tuple(
            Code(
                code_id=c["CodeID"],
                code_type=c.get("CodeType", "Normal"),
                control_code=c.get("ControlCode"),
                display_text=c.get("DisplayText", ""),
                string_value=c.get("StringValue", ""),
                numeric_value=c.get("NumericValue"),
                match_values=tuple(c.get("MatchValues") or ()),
            )
            for c in d.get("Codes", ())
        )
        return CodeScheme(
            scheme_id=d["SchemeID"],
            name=d.get("Name", ""),
            version=d.get("Version", ""),
            codes=codes,
        )

    @staticmethod
    def from_json(path: str) -> "CodeScheme":
        with open(path) as f:
            return CodeScheme.from_dict(json.load(f))


def auto_code(df: DataFrame, scheme: CodeScheme,
              text_col: str = "text") -> DataFrame:
    """M12: messages with NO label in `scheme` whose normalized text
    matches a code's MatchValues get an UNCHECKED suggestion label
    prepended. One when-chain over the broadcast match table — no
    shuffle, no UDF."""
    norm = F.lower(F.trim(F.col(text_col)))
    suggestion = F.lit(None).cast("string")
    for code in scheme.codes:
        for mv in code.match_values:
            suggestion = F.when(norm == mv.lower(), F.lit(code.code_id)).otherwise(suggestion)
    labels = F.col("labels")
    has_label = F.exists(labels, lambda l: l["scheme_id"] == scheme.scheme_id)
    cond = ~has_label & suggestion.isNotNull()
    new_label = make_label(
        scheme_id=F.lit(scheme.scheme_id), code_id=suggestion,
        date_time_utc=F.col("last_updated"), checked=F.lit(False),
        origin_id=F.lit("auto_code:match_values"))
    return df.withColumn(
        "labels", F.when(cond, F.concat(F.array(new_label), labels)).otherwise(labels))


def invalid_labels(df: DataFrame, schemes: dict[str, set[str]],
                   extra_valid: tuple[str, ...] = ("SPECIAL-MANUALLY_UNCODED",),
                   ) -> DataFrame:
    """M13: rows carrying a label whose (scheme_id, code_id) is not in
    the known-scheme registry — the reference raises; returning the
    offending rows lets callers assert-empty (F3 style) or divert to a
    quarantine sink."""
    def label_invalid(l: Column) -> Column:
        known = F.lit(False)
        for scheme_id, code_ids in schemes.items():
            ok_codes = F.lit(False)
            for cid in sorted(code_ids):
                ok_codes = ok_codes | (l["code_id"] == cid)
            for cid in extra_valid:
                ok_codes = ok_codes | (l["code_id"] == cid)
            known = known | ((l["scheme_id"] == scheme_id) & ok_codes)
        return ~known

    return df.where(F.exists(F.col("labels"), label_invalid))
