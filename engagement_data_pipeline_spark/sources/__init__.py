"""Sources: ingest normalisation to the Message schema (SURVEY §2.1).

Live source APIs (Rapid Pro, Facebook, Telegram, Coda, …) are out of
scope offline; each source is modelled as a schema adapter over a
fixture table. `synthetic` derives a deterministic engagement-DB
`messages` table from the driver's events parquet — it stands in for
the S1 engagement-DB scan and gives every downstream operator a real
nested-schema input at any scale factor.
"""

from .synthetic import synthetic_messages, MESSAGES_CTE, latest_cte  # noqa: F401
