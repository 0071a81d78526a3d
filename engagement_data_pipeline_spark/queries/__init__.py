"""Runnable demo queries over the synthetic testdata, each paired with
a DuckDB oracle SQL string (the driver's correctness gate).

Every query is expressed through the package's operator library and
returns a DataFrame whose values hash-match the oracle exactly (see
_helpers for the cross-engine exactness rules).
"""

from .registry import QUERIES, FLAGSHIP, get_queries, get_oracles  # noqa: F401
