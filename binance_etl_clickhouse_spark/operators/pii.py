"""PII detection and redaction over text columns — training-data hygiene.

A standard stage of LLM-corpus preparation (scrub emails / phone numbers /
IPs / SSNs / credit cards before training). Everything here is pure JVM
expressions — ``regexp_count`` / ``regexp_extract_all`` / ``aggregate``
folds, no UDFs — so the scan stays inside whole-stage codegen and scales
linearly in bytes of text with zero shuffles (a per-row map over the
corpus at any scale).

Credit cards are the non-regex-expressible class: a digit-run REGEX only
nominates candidates; each candidate is validated with the Luhn checksum
as an expression fold (double every second digit from the right, subtract
9 past 9, sum % 10 == 0) plus the 13–19 digit length gate — so
``4111111111111111`` redacts while a random 16-digit number survives.

The regexes stay inside the Java-regex ∩ RE2 common subset (no
lookaround) so a DuckDB oracle can replicate them verbatim.

Redaction order matters and is fixed: credit cards (longest digit spans)
→ emails (their host part may contain IP-shaped text) → SSNs → phones →
IPv4. Counts are always measured on the ORIGINAL text, independent of
that order.

Supersedes the two-class (email + 7-digit-phone) ``operators/text.py
redact_pii``, which stays as the r1-era ``pii_redaction`` query's pinned
shape; new callers should use this module (``pii_detect_redact`` is the
registered end-to-end query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Java-regex ∩ RE2 subset (also used verbatim by the DuckDB oracle twin)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
#: 3-3-4 with ./-/space separators and optional area-code parens; the
#: separator REQUIREMENT keeps 10-digit runs for the Luhn path
PHONE_RE = r"\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b"
#: candidate digit runs (13–19 digits, optional single space/dash between
#: digits); word boundaries keep runs embedded in tokens out
CC_CANDIDATE_RE = r"\b\d(?:[ -]?\d){12,18}\b"

REDACTED = {
    "credit_card": "<CREDIT_CARD>",
    "email": "<EMAIL>",
    "ssn": "<SSN>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def luhn_valid(candidate: Column) -> Column:
    """Expression-level Luhn check of a candidate string (separators
    stripped): reversed digits, every second doubled (−9 past 9), sum
    divisible by 10, and 13–19 digits total."""
    digits = F.regexp_replace(candidate, "[^0-9]", "")
    rev = F.reverse(F.filter(F.split(digits, ""), lambda ch: ch != F.lit("")))
    contrib = F.transform(
        rev,
        lambda ch, i: F.when(i % 2 == 0, ch.cast("int")).otherwise(
            F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9).otherwise(
                ch.cast("int") * 2
            )
        ),
    )
    total = F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x)
    return (total % 10 == 0) & F.length(digits).between(13, 19)


def valid_cards(text: Column) -> Column:
    """Array of Luhn-valid card candidates found in ``text``."""
    return F.filter(F.regexp_extract_all(text, F.lit(CC_CANDIDATE_RE), 0), luhn_valid)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class occurrence counts on the original text (unaliased)."""
    return {
        "n_email": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_phone": F.regexp_count(text, F.lit(PHONE_RE)),
        "n_ssn": F.regexp_count(text, F.lit(SSN_RE)),
        "n_ipv4": F.regexp_count(text, F.lit(IPV4_RE)),
        "n_credit_card": F.size(valid_cards(text)),
    }


def redact_pii(text: Column) -> Column:
    """``text`` with every detected span replaced by its class placeholder
    (fixed order — see module doc). Luhn-invalid digit runs survive."""
    t = F.aggregate(
        valid_cards(text),
        text,
        lambda acc, cand: F.replace(acc, cand, F.lit(REDACTED["credit_card"])),
    )
    t = F.regexp_replace(t, EMAIL_RE, REDACTED["email"])
    t = F.regexp_replace(t, SSN_RE, REDACTED["ssn"])
    t = F.regexp_replace(t, PHONE_RE, REDACTED["phone"])
    return F.regexp_replace(t, IPV4_RE, REDACTED["ipv4"])


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-class counts + the redacted text column (``<col>_redacted``).

    One codegen'd projection pass; no shuffle, no UDF. At 100 TB this is
    a map-only stage bounded by scan throughput.
    """
    c = F.col(text_col)
    out = df
    for name, expr in pii_counts(c).items():
        out = out.withColumn(name, expr)
    return out.withColumn(f"{text_col}_redacted", redact_pii(c))
