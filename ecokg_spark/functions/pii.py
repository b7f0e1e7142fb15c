"""PII scrubbing column expressions for web-text curation.

Training corpora built from crawled text routinely mask emails, IPs and
phone numbers before the data leaves the pipeline. All expressions here
are pure Catalyst (`regexp_replace` / `regexp_count` — JVM-side, inside
whole-stage codegen with the scan); the patterns avoid lookaround and
backreferences so they mean the same thing under Java regex (Spark) and
RE2 (the DuckDB oracle), which recomputes every redaction verbatim.

Beyond-reference surface: the reference ingests curated TSV dumps and has
no PII handling at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared verbatim with the DuckDB oracle SQL in ecokg_spark.contract.
# Order of application matters: emails first (their local part can look
# like a phone), then IPs (a bare dotted quad must not half-match the
# phone pattern), then phones.
RE_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
RE_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
RE_PHONE = (
    "\\+?[0-9]{1,3}[-. ]?\\(?[0-9]{2,4}\\)?[-. ][0-9]{3,4}[-. ][0-9]{3,4}"
    "|\\+[0-9]{9,14}"
)

EMAIL_TOKEN = "[EMAIL]"
IP_TOKEN = "[IP]"
PHONE_TOKEN = "[PHONE]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(col: Column | str) -> Column:
    """Replace emails, IPv4 addresses and phone numbers with placeholder
    tokens, in that order."""
    out = F.regexp_replace(_c(col), RE_EMAIL, EMAIL_TOKEN)
    out = F.regexp_replace(out, RE_IPV4, IP_TOKEN)
    return F.regexp_replace(out, RE_PHONE, PHONE_TOKEN)


def pii_counts(col: Column | str) -> list[Column]:
    """(n_emails, n_ips, n_phones) found in the column — the audit signal
    a redaction pass reports. Counted on the same progressively-redacted
    text redact_pii sees, so counts always match what was replaced."""
    c = _c(col)
    after_email = F.regexp_replace(c, RE_EMAIL, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, RE_IPV4, IP_TOKEN)
    return [
        F.regexp_count(c, F.lit(RE_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(after_email, F.lit(RE_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count(after_ip, F.lit(RE_PHONE)).cast("long").alias("n_phones"),
    ]
