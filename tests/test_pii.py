"""PII scrubbing operator tests: runtime oracle via Python `re` (the
module's patterns are dialect-portable by design), edge cases, and a
no-Python-UDF plan assertion (the operator must stay JVM-side)."""

from __future__ import annotations

import re


CASES = [
    (0, "write to bob.smith+x@lists.example.org today"),
    (1, "server 192.168.001.042 then 10.0.0.1 up"),
    (2, "call 555-867-5309 or 555.123.4567"),  # dotted phone: NOT redacted
    (3, "mixed a_b%c@x-y.co 8.8.8.8 555-000-1111"),
    (4, "no pii at all"),
    (5, ""),
    (6, "not-an-ip 1.2.3.4567 and half@email"),  # 4567 breaks \\b
    (7, "two mails a@b.io c@d.io and twice 1.1.1.1 1.1.1.1"),
]


def _oracle(text):
    from cis555_search_engine_spark.operators.pii import PII_PATTERNS

    counts = {name: len(re.findall(p, text)) for name, p, _ in PII_PATTERNS}
    clean = text
    for _, p, tok in PII_PATTERNS:
        clean = re.sub(p, tok, clean)
    return clean, counts


def test_pii_scrub_matches_re_oracle(spark):
    from cis555_search_engine_spark.operators.pii import pii_scrub

    docs = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in pii_scrub(docs).collect()}
    assert set(got) == {i for i, _ in CASES}
    for i, text in CASES:
        clean, counts = _oracle(text)
        row = got[i]
        assert row["clean_text"] == clean, (i, row["clean_text"], clean)
        for name, n in counts.items():
            assert row[f"n_{name}"] == n, (i, name)
        assert row["n_pii"] == sum(counts.values())


def test_pii_scrub_specific_redactions(spark):
    from cis555_search_engine_spark.operators.pii import pii_scrub

    docs = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {r["id"]: r for r in pii_scrub(docs).collect()}
    assert got[0]["clean_text"] == "write to <EMAIL> today"
    assert got[1]["clean_text"] == "server <IP> then <IP> up"
    # dotted phones are out of pattern scope (documented), dashed in
    assert got[2]["clean_text"] == "call <PHONE> or 555.123.4567"
    assert got[6]["n_pii"] == 0  # trailing digit kills the \b ipv4 match
    assert (got[7]["n_email"], got[7]["n_ipv4"]) == (2, 2)


def test_pii_scrub_is_jvm_only(spark):
    from cis555_search_engine_spark.operators.pii import pii_scrub

    docs = spark.createDataFrame(CASES, "doc_id long, text string")
    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure map: zero shuffles
