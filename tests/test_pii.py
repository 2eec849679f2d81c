"""PII detection + redaction (operators/pii.py): expression-level Luhn,
per-class counts, fixed-order placeholder redaction — all pure JVM
expressions (no UDF), pinned here on crafted spans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.pii import (
    luhn_valid,
    pii_scrub,
    redact_pii,
    valid_cards,
)


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (1, "mail me at jane.doe+x@sub.example.co.uk or call (555) 123-4567"),
        (2, "ssn 123-45-6789 server 192.168.1.254 done"),
        (3, "card 4111 1111 1111 1111 backup 5500-0000-0000-0004"),
        (4, "not a card: 4111111111111112 and plain 1234567890123456"),
        (5, "clean text with numbers 42 and words only"),
        (6, "two mails a@b.io c@d.org and 10.0.0.1 10.0.0.2 10.0.0.3"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _one(spark, expr_col):
    return spark.range(1).select(expr_col.alias("x")).collect()[0]["x"]


class TestLuhn:
    @pytest.mark.parametrize(
        "num,ok",
        [
            ("4111111111111111", True),  # classic Visa test number
            ("5500-0000-0000-0004", True),  # separators stripped
            ("4111 1111 1111 1111", True),
            ("4111111111111112", False),  # checksum off by one
            ("1234567890123456", False),
            ("411111111111", False),  # 12 digits: under the 13 floor
        ],
    )
    def test_known_numbers(self, spark, num, ok):
        assert _one(spark, luhn_valid(F.lit(num))) is ok

    def test_valid_cards_filters_candidates(self, spark):
        got = _one(
            spark,
            valid_cards(
                F.lit("a 4111111111111111 b 4111111111111112 c 9999")
            ),
        )
        assert got == ["4111111111111111"]


class TestScrub:
    def test_counts_per_class(self, spark, pii_df):
        out = {r.doc_id: r for r in pii_scrub(pii_df).collect()}
        assert (out[1].n_email, out[1].n_phone) == (1, 1)
        assert (out[2].n_ssn, out[2].n_ipv4) == (1, 1)
        assert out[3].n_credit_card == 2
        assert out[4].n_credit_card == 0
        assert out[6].n_email == 2 and out[6].n_ipv4 == 3
        clean = out[5]
        assert (
            clean.n_email + clean.n_phone + clean.n_ssn
            + clean.n_ipv4 + clean.n_credit_card
        ) == 0

    def test_redaction_replaces_spans(self, spark, pii_df):
        out = {r.doc_id: r.text_redacted for r in pii_scrub(pii_df).collect()}
        assert "<EMAIL>" in out[1] and "<PHONE>" in out[1]
        assert "jane.doe" not in out[1] and "123-4567" not in out[1]
        assert out[2] == "ssn <SSN> server <IP> done"
        assert out[3] == "card <CREDIT_CARD> backup <CREDIT_CARD>"

    def test_luhn_invalid_runs_survive(self, spark, pii_df):
        out = {r.doc_id: r.text_redacted for r in pii_scrub(pii_df).collect()}
        assert "4111111111111112" in out[4]
        assert "1234567890123456" in out[4]

    def test_clean_text_unchanged(self, spark, pii_df):
        out = {r.doc_id: r.text_redacted for r in pii_scrub(pii_df).collect()}
        assert out[5] == "clean text with numbers 42 and words only"

    def test_plan_is_map_only(self, spark, pii_df):
        plan = (
            pii_scrub(pii_df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # no shuffle: pure projection pass
