"""Scalar / string / datetime functions (SURVEY §2.9 X1-X10).

All pure column expressions — no UDFs — so they inline into
whole-stage codegen and cost nothing beyond the scan."""

from .cleaners import (
    CSV_TIMESTAMP_FORMATS,
    coda_id,
    min_timestamp,
    normalise_urn,
    operator_from_urn,
    parse_multiformat_timestamp,
    urn_is_valid,
    validate_phone,
)

__all__ = [
    "CSV_TIMESTAMP_FORMATS",
    "coda_id",
    "min_timestamp",
    "normalise_urn",
    "operator_from_urn",
    "parse_multiformat_timestamp",
    "urn_is_valid",
    "validate_phone",
]
