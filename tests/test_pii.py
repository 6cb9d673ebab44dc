"""PII detection/redaction: hand-pinned cases (counts + exact redacted
bytes) against the Spark operator, decoy non-matches, and DuckDB RE2
parity for the shared pattern constants."""

from __future__ import annotations

import duckdb
import pytest

from finetoo_sp_spark.operators.pii import (
    EMAIL_RE,
    IPV4_RE,
    MASKS,
    PHONE_RE,
    SSN_RE,
    pii_scan,
)

# (text, n_emails, n_phones, n_ipv4, n_ssn, redacted)
CASES = [
    (
        "write to bob.smith+tag@mail.example.com today",
        1, 0, 0, 0,
        "write to [EMAIL] today",
    ),
    (
        "call (555) 123-4567 or 555 123 4567 x9",
        0, 2, 0, 0,
        "call [PHONE] or [PHONE] x9",
    ),
    (
        "servers 10.0.0.1 and 192.168.255.254, not 999.1.2.3",
        0, 0, 2, 0,
        # 999 is not a valid octet, and \b forbids shedding its leading
        # digit to start a match mid-run: the whole token is left alone.
        "servers [IP] and [IP], not 999.1.2.3",
    ),
    (
        "ssn 123-45-6789 on file",
        0, 0, 0, 1,
        "ssn [SSN] on file",
    ),
    (
        "v1.2.3 build 4567; support at example dot com; order 1234.5678",
        0, 0, 0, 0,
        "v1.2.3 build 4567; support at example dot com; order 1234.5678",
    ),
    (
        "a@b.co cc c.d@e-f.org via 8.8.8.8 tel 800-555-0100",
        2, 1, 1, 0,
        "[EMAIL] cc [EMAIL] via [IP] tel [PHONE]",
    ),
    # SSN shape must be claimed by the SSN mask, not the phone mask.
    ("ids 321-54-9876 and (321) 549-8760", 0, 1, 0, 1, "ids [SSN] and [PHONE]"),
]


@pytest.fixture(scope="module")
def scanned(spark):
    rows = [(i, c[0]) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = pii_scan(df, "id", "text").orderBy("id").collect()
    return out


def test_hand_pinned_counts_and_redaction(scanned):
    for row, (text, ne, np_, ni, ns, red) in zip(scanned, CASES):
        got = (row.n_emails, row.n_phones, row.n_ipv4, row.n_ssn)
        assert got == (ne, np_, ni, ns), (text, got)
        assert row.redacted == red, (text, row.redacted)
        assert row.has_pii == (ne + np_ + ni + ns > 0)


def test_duckdb_re2_parity():
    """The dialect-subset discipline holds: RE2 (DuckDB) produces the
    same counts and redactions as Java regex (Spark) for every pinned
    case — the two engines' regex automata agree on these patterns."""
    con = duckdb.connect()
    for text, ne, np_, ni, ns, red in CASES:
        counts = con.execute(
            "SELECT len(regexp_extract_all($t, $e)), len(regexp_extract_all($t, $p)),"
            " len(regexp_extract_all($t, $i)), len(regexp_extract_all($t, $s))",
            {"t": text, "e": EMAIL_RE, "p": PHONE_RE, "i": IPV4_RE, "s": SSN_RE},
        ).fetchone()
        assert counts == (ne, np_, ni, ns), (text, counts)
        got = text
        for pat, mask in MASKS:
            got = con.execute(
                "SELECT regexp_replace($t, $p, $m, 'g')",
                {"t": got, "p": pat, "m": mask},
            ).fetchone()[0]
        assert got == red, (text, got)


def test_plan_is_narrow(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "id long, text string")
    plan = pii_scan(df, "id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
