"""Analysis stage: the reference's engagement_db_to_analysis flow
(SURVEY §3.2) re-expressed as composable DataFrame stages:
fetch (F1-F4) → filter (F5/F6) → impute (M1-M9) → column views
(G1/G2) → automated analysis (A1-A9).
"""

from .spine import fetch_messages, filter_messages  # noqa: F401
