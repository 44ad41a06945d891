"""The corpus fixture carries no emails/phones/IPs, so the fixture
parity row alone would leave those regex classes vacuously green. This
test drives crafted PII rows through BOTH engines with the exact
production patterns — proving the Java-regex (Spark) and RE2 (DuckDB)
sides agree on real redactions, not just on clean text."""

from __future__ import annotations

from tests.conftest import assert_oracle_match

from pac_spark.operators.scrub import SCRUB_SQL, scrub_frame

ROWS = [
    (0, "en", "mail me at alice.smith+work@example.co.uk today"),
    (1, "en", "call +1 (555) 123-4567 or 020 7946 0958 now"),
    (2, "en", "server at 192.168.0.1 and 10.0.0.255 responded"),
    (3, "en", "the customer called the customers desk customer"),
    (4, "en", "mixed: bob@x.io from 8.8.8.8 dialed 555-867-5309 customer"),
    (5, "en", "perfectly clean text with no identifiers at all"),
    (6, "zh", "a@b.cc a@b.cc twice and a boundary customer."),
]


def test_scrub_parity_on_crafted_pii(spark, duck):
    docs = spark.createDataFrame(ROWS, "doc_id long, lang string, text string")
    duck.execute("CREATE OR REPLACE TABLE _pii(doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    duck.executemany("INSERT INTO _pii VALUES (?, ?, ?)", ROWS)
    assert_oracle_match(
        scrub_frame(docs).orderBy("doc_id"),
        duck.sql(SCRUB_SQL(source="_pii")),
    )


def test_scrub_actually_redacts(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in scrub_frame(docs).collect()}
    assert out[0]["n_email"] == 1 and "<EMAIL>" in out[0]["scrubbed_text"]
    assert "alice" not in out[0]["scrubbed_text"]
    assert out[1]["n_phone"] >= 2 and "<PHONE>" in out[1]["scrubbed_text"]
    assert out[2]["n_ipv4"] == 2 and out[2]["scrubbed_text"].count("<IP>") == 2
    # word-boundary denylist: 'customers' must NOT be redacted
    assert out[3]["n_denylist"] == 2
    assert "customers" in out[3]["scrubbed_text"]
    assert out[4]["is_clean"] is False and out[5]["is_clean"] is True
    # every class fires in one doc
    assert all(out[4][f"n_{c}"] >= 1 for c in ("email", "ipv4", "phone", "denylist"))


def test_denylist_terms_are_escaped_and_nonempty(spark, duck):
    import pytest

    from pac_spark.operators.scrub import scrub_frame

    rows = [(0, "en", "met j.doe and jxdoe plus c++fan today")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = scrub_frame(docs, denylist=("j.doe", "c++fan")).collect()[0]
    # '.' must not act as a wildcard, '++' must not blow up the parser
    assert out["n_denylist"] == 2
    assert "jxdoe" in out["scrubbed_text"]
    assert "j.doe" not in out["scrubbed_text"]
    # terms with NON-WORD edge chars: an unconditional \b would make
    # these silently unmatchable (\b after '+' or before '@' needs an
    # adjacent word char)
    rows2 = [(0, "en", "use c++ and ping @handle now")]
    docs2 = spark.createDataFrame(rows2, "doc_id long, lang string, text string")
    out2 = scrub_frame(docs2, denylist=("c++", "@handle")).collect()[0]
    assert out2["n_denylist"] == 2, out2
    assert "c++" not in out2["scrubbed_text"] and "@handle" not in out2["scrubbed_text"]
    with pytest.raises(ValueError):
        scrub_frame(docs, denylist=())
    # the escaped pattern must be RE2-valid too (oracle side)
    from pac_spark.operators.scrub import SCRUB_SQL

    duck.execute("CREATE OR REPLACE TABLE _esc(doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    duck.executemany("INSERT INTO _esc VALUES (?, ?, ?)", rows)
    orc = duck.sql(SCRUB_SQL(source="_esc", denylist=("j.doe", "c++fan"))).fetchall()
    assert orc[0][2 + 3] == 2  # n_denylist column (doc_id, lang, 3 pii counts, denylist)
