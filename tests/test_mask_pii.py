"""PII masking (`text.mask_pii`): placeholder substitution, per-kind
counts on the original text, application order, and kind selection."""

import pytest

from debezium_connector_yugabytedb_1_spark.operators.text import mask_pii


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return mask_pii(df, **kw).first().asDict()


def test_masks_all_kinds_and_counts(spark):
    r = _one(
        spark,
        "mail a.b+c@corp.example.com or x@y.io, see https://ex.com/a?b=1 "
        "call (555) 123-4567 or 555-987-6543 from 192.168.0.1",
    )
    assert r["text_masked"] == (
        "mail <EMAIL> or <EMAIL>, see <URL> call <PHONE> or <PHONE> from <IP>"
    )
    assert (r["n_email"], r["n_url"], r["n_phone"], r["n_ip"]) == (2, 1, 2, 1)


def test_email_inside_url_ticks_both_counters(spark):
    r = _one(spark, "ref https://host.com/u?mail=a@b.co end")
    # counts audit the ORIGINAL text; the mask chain normalizes the email
    # first, then the URL mask swallows the token
    assert r["n_email"] == 1 and r["n_url"] == 1
    assert r["text_masked"] == "ref <URL> end"


def test_kind_selection_and_unknown_kind(spark):
    r = _one(spark, "a@b.co at 10.0.0.1", kinds=("email",))
    assert r["text_masked"] == "<EMAIL> at 10.0.0.1"
    assert "n_ip" not in r
    with pytest.raises(ValueError, match="unknown PII kinds"):
        _one(spark, "x", kinds=("email", "ssn"))


def test_clean_text_untouched(spark):
    r = _one(spark, "no personal data in this sentence")
    assert r["text_masked"] == "no personal data in this sentence"
    assert r["n_email"] == r["n_url"] == r["n_phone"] == r["n_ip"] == 0
