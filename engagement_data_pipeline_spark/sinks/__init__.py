"""Export sinks (SURVEY §2.2 K2/K3/K4)."""

from .exports import (
    analysis_matrix,
    analysis_matrix_headers,
    production_columns,
    write_csv,
    write_jsonl,
)

__all__ = [
    "analysis_matrix",
    "analysis_matrix_headers",
    "production_columns",
    "write_csv",
    "write_jsonl",
]
