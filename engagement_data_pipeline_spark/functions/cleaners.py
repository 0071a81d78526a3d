"""URN / phone / timestamp cleaning functions.

Reference semantics:
  X1 URN normalisation — rapid_pro_to_engagement_db.py:117-172
     (whatsapp:<num> → tel:+<num>; telegram:<id>#<user> → telegram:<id>;
     tel URNs must carry a country code).
  X2 phone validation — google_form_to_engagement_db.py:61-100
     (strip formatting, prepend country code, prefix allow-list,
     length check).
  X3 operator-from-URN — URNCleaner.clean_operator call sites
     (rapid_pro_to_engagement_db.py:362): phone-prefix → operator
     lookup; non-tel schemes are their own operator.
  X4 sha-256 coda_id — engagement_db_to_coda.py:86.
  X5 multi-format datetime parse — csv_to_engagement_db.py:22-41
     (try each known format in order; first hit wins).
  X10 min-of-timestamps — google_form_to_engagement_db.py:213.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# The six timestamp formats the reference has seen in recovery CSVs
# (csv_to_engagement_db.py:33-34), as Spark datetime patterns.
CSV_TIMESTAMP_FORMATS = [
    "d/M/yyyy H:mm",
    "d/M/yyyy H:mm:ss",
    "d/M/yyyy H:mm:ss.SSSSSS",
    "yyyy/M/d H:mm:ss.SSSSSS",
    "yyyy/M/d H:mm:ss",
    "yyyy-M-d H:mm:ss",
]


def normalise_urn(urn: Column) -> Column:
    """X1: canonicalise a single URN (whatsapp→tel:+, strip telegram
    #username; other schemes pass through)."""
    no_tag = F.when(urn.startswith("telegram:"),
                    F.split(urn, "#")[0]).otherwise(urn)
    return F.when(no_tag.startswith("whatsapp:"),
                  F.concat(F.lit("tel:+"), F.split(no_tag, ":")[1])).otherwise(no_tag)


def urn_is_valid(urn: Column) -> Column:
    """X1 validation half: tel URNs must have a country code (the
    reference asserts; as a column this supports a where() or an
    invalid-rows side output)."""
    return ~urn.startswith("tel:") | urn.startswith("tel:+")


def operator_from_urn(urn: Column, prefix_operators: Mapping[str, str],
                      default: str = "unknown") -> Column:
    """X3: channel operator from a normalised URN. tel URNs map by
    phone prefix (longest-prefix-first), other schemes are their own
    operator (telegram:… → 'telegram')."""
    scheme = F.split(urn, ":")[0]
    expr = F.lit(default)
    for prefix in sorted(prefix_operators, key=len):
        expr = F.when(urn.startswith(f"tel:+{prefix}"),
                      F.lit(prefix_operators[prefix])).otherwise(expr)
    return F.when(scheme != "tel", scheme).otherwise(expr)


def validate_phone(phone: Column, country_code: str,
                   valid_prefixes: Sequence[str], valid_length: int) -> Column:
    """X2: normalise a raw phone string to digits with country code;
    NULL when it fails the prefix allow-list or length check."""
    digits = F.regexp_replace(phone, r"[^0-9]", "")
    with_cc = (
        F.when(digits.startswith(country_code), digits)
        .when(digits.startswith("0"),
              F.concat(F.lit(country_code), F.substring(digits, 2, 0x7FFFFFF)))
        .otherwise(F.concat(F.lit(country_code), digits))
    )
    prefix_ok = F.lit(False)
    for p in valid_prefixes:
        prefix_ok = prefix_ok | with_cc.startswith(p)
    ok = prefix_ok & (F.length(with_cc) == valid_length)
    return F.when(ok, with_cc)


def coda_id(text: Column) -> Column:
    """X4: sha-256 hex of the message text — same-text messages share
    one Coda entry (engagement_db_to_coda.py:86)."""
    return F.sha2(text, 256)


def parse_multiformat_timestamp(raw: Column,
                                formats: Sequence[str] = CSV_TIMESTAMP_FORMATS) -> Column:
    """X5: first-matching-format parse; NULL if nothing matches
    (callers decide whether that's fatal, as the reference does).

    A failed try_to_timestamp is an exception-driven slow path, so
    rows are first dispatched to their syntactically-matching format
    by cheap regexes (the six formats are mutually exclusive on
    separator / year position / fraction); the ordered try-chain only
    runs for rows no dispatch rule claims, preserving the reference's
    first-format-wins semantics exactly."""
    chain = F.coalesce(*[F.try_to_timestamp(raw, F.lit(f)) for f in formats])
    if list(formats) != CSV_TIMESTAMP_FORMATS:
        return chain
    frac = raw.contains(".")
    fast = (
        F.when(raw.rlike(r"^\d{4}-"), F.try_to_timestamp(raw, F.lit("yyyy-M-d H:mm:ss")))
        .when(raw.rlike(r"^\d{4}/"),
              F.when(frac, F.try_to_timestamp(raw, F.lit("yyyy/M/d H:mm:ss.SSSSSS")))
              .otherwise(F.try_to_timestamp(raw, F.lit("yyyy/M/d H:mm:ss"))))
        .when(frac, F.try_to_timestamp(raw, F.lit("d/M/yyyy H:mm:ss.SSSSSS")))
        .when(raw.rlike(r":\d{1,2}:"), F.try_to_timestamp(raw, F.lit("d/M/yyyy H:mm:ss")))
        .otherwise(F.try_to_timestamp(raw, F.lit("d/M/yyyy H:mm")))
    )
    return F.coalesce(fast, chain)


def min_timestamp(*cols: Column) -> Column:
    """X10: earliest of several timestamps (null-safe least)."""
    return F.least(*cols)
