"""Generic relational operators.

Each function is a pure DataFrame -> DataFrame transform, parameterised
by column names so the same operator serves the engagement-message
tables and any other dataset. All are built from declarative DataFrame
ops (windows, anti/semi joins, higher-order array functions) so
Catalyst plans them — no driver-side loops, no RDDs.
"""

from .dedup import latest_snapshot, duplicate_keys, idempotent_upsert  # noqa: F401
from .filters import (  # noqa: F401
    resolve_live_stale,
    time_range_filter,
    exclude_values,
    allowlist_semi_join,
    retraction_anti_join,
    timestamp_router,
)
from .folds import fold_concat, fold_distinct_concat  # noqa: F401
from .topk import top_k_per_group  # noqa: F401
