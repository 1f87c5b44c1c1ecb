"""Text-analysis expressions."""

import hashlib

import pytest
from pyspark.sql import functions as F

from osm_wayback_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    shingles,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog of a house is big"),
        (2, "el gato y la casa de los perros que corren"),
        (3, "xyz qqq zzz"),
        (4, ""),
        (5, "  spaced   out   words  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _collect(docs, col):
    return {r.doc_id: r.v for r in docs.select("doc_id", col.alias("v")).collect()}


def test_token_count(docs):
    got = _collect(docs, token_count(F.col("text")))
    assert got[1] == 10
    assert got[4] == 0
    assert got[5] == 3


def test_lang_id(docs):
    got = _collect(docs, lang_id(F.col("text")))
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "und"


def test_fingerprint_normalizes_whitespace(docs):
    got = _collect(docs, fingerprint(F.col("text")))
    assert got[5] == hashlib.md5(b"spaced out words").hexdigest()


def test_quality_score_bounds(docs):
    got = _collect(docs, quality_score(F.col("text")))
    for v in got.values():
        assert 0.0 <= v <= 1.0
    assert got[1] > got[3]  # stopword-rich text scores higher


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], "doc_id long, text string")
    got = {r.doc_id: sorted(r.v) for r in df.select("doc_id", shingles(F.col("text"), 3).alias("v")).collect()}
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == ["a b"]  # shorter than n → single full shingle


def test_token_count_bpe(spark):
    from osm_wayback_spark.functions.text import token_count_bpe

    df = spark.createDataFrame(
        [(1, "hello, world! it's 2x"), (2, "abc"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.v
        for r in df.select("doc_id", token_count_bpe(F.col("text")).alias("v")).collect()
    }
    # hello , world ! it ' s 2x → 8
    assert got[1] == 8
    assert got[2] == 1
    assert got[3] == 0


def test_repetition_ratios(spark):
    """Gopher-style repetition signals: exact values on crafted
    texts, 0.0 conventions on empty/short inputs."""
    from osm_wayback_spark.functions.text import (
        dup_ngram_ratio,
        ngrams,
        top_ngram_ratio,
    )

    df = spark.createDataFrame(
        [
            (1, "spam spam spam eggs"),   # top word 3/4; bigrams: [s s, s s, s e] → dup 1/3
            (2, "all words differ here"),  # no repetition
            (3, ""),                       # empty → 0.0 everywhere
            (4, "solo"),                   # 1 word: no bigrams → 0.0
            (5, "a b a b a b a"),          # heavy bigram looping
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            top_ngram_ratio(F.col("text"), 1).alias("tw"),
            dup_ngram_ratio(F.col("text"), 2).alias("d2"),
            F.size(ngrams(F.col("text"), 2)).alias("n2"),
        ).collect()
    }
    assert out[1].tw == 0.75 and out[1].d2 == round(1 - 2 / 3, 6)
    assert out[2].tw == 0.25 and out[2].d2 == 0.0
    assert out[3].tw == 0.0 and out[3].d2 == 0.0 and out[3].n2 == 0
    assert out[4].tw == 1.0 and out[4].d2 == 0.0 and out[4].n2 == 0
    # "a b a b a b a": 6 bigrams, 2 distinct → dup 4/6; top word 4/7
    assert out[5].d2 == round(1 - 2 / 6, 6)
    assert out[5].tw == round(4 / 7, 6)


def test_shingles_sliding_equals_index_form(spark):
    """The zip_with sliding-window shingles must equal the reference
    index formulation (transform over sequence + per-element slice)
    for several n, including the <n-words degenerate case."""
    from pyspark.sql import functions as F

    from osm_wayback_spark.functions.text import shingles, words

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "one two"),
            (3, "solo"),
            (4, "x x x x"),  # duplicate shingles → distinct
            (5, "  padded   whitespace   here  "),
        ],
        "doc_id long, text string",
    )
    for n in (1, 2, 3, 4):
        w = words(F.col("text"))
        ref = F.array_distinct(
            F.when(
                F.size(w) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - n),
                    lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
                ),
            ).otherwise(F.array(F.concat_ws(" ", w)))
        )
        out = docs.select(
            F.sort_array(shingles(F.col("text"), n)).alias("a"),
            F.sort_array(ref).alias("b"),
        ).collect()
        for r in out:
            assert r.a == r.b, (n, r)


def test_pii_count_and_redact(spark):
    from pyspark.sql import functions as F

    from osm_wayback_spark.functions.text import pii_count, redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-1.co.uk now"),
            (2, "call 555-123.4567 or 555.111-2222"),
            (3, "host 10.0.255.7 and 192.168.1.1"),
            (4, "clean text with digits 12345 and at@ sign alone"),
            # the email's host must not be half-eaten as an IP
            (5, "user@10.0.0.1 logged in from 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            pii_count(F.col("text"), "email").alias("e"),
            pii_count(F.col("text"), "phone").alias("p"),
            pii_count(F.col("text"), "ip").alias("i"),
            redact_pii(F.col("text")).alias("t"),
        ).collect()
    }
    assert (out[1].e, out[1].p, out[1].i) == (1, 0, 0)
    assert out[1].t == "mail <EMAIL> now"
    assert (out[2].e, out[2].p, out[2].i) == (0, 2, 0)
    assert out[2].t == "call <PHONE> or <PHONE>"
    assert (out[3].e, out[3].p, out[3].i) == (0, 0, 2)
    assert out[3].t == "host <IP> and <IP>"
    assert (out[4].e, out[4].p, out[4].i) == (0, 0, 0)
    assert out[4].t == docs.filter("doc_id=4").first().text
    # email-first ordering: user@10.0.0.1 is ONE email, not an IP
    assert out[5].t == "<EMAIL> logged in from <IP>"


def test_canonical_url(spark):
    from pyspark.sql import functions as F

    from osm_wayback_spark.functions.text import canonical_url

    cases = {
        "HtTpS://WWW.Ex.COM:443/Docs/9?utm_source=a&id=9&ref=x#frag":
            "https://www.ex.com/Docs/9?id=9",
        "http://Host.com:80/p?a=1&utm_b=2&b=3": "http://host.com/p?a=1&b=3",
        "https://h.io/p?utm_x=1": "https://h.io/p",
        # bare 'utm' (no underscore) is NOT a tracking param
        "https://h.io/p?ref=1&utm=2": "https://h.io/p?utm=2",
        # non-default port and path case preserved
        "http://h.io:8080/Keep?x=1": "http://h.io:8080/Keep?x=1",
        # :443 on http is NOT default — kept
        "http://h.io:443/p": "http://h.io:443/p",
        "https://h.io/p?fbclid=abc&gclid=q": "https://h.io/p",
        "ftp://H.IO/path#x": "ftp://h.io/path",
        # param-name match is ANCHORED: 'ref='/'utm_' inside OTHER
        # names (href=, pref=) must not fire — the unanchored form
        # canonicalized '?href=foo&a=b' to '?ha=b' (wrongful merges)
        "https://h.io/p?href=foo&a=b": "https://h.io/p?href=foo&a=b",
        "https://h.io/p?pref=1&x=2": "https://h.io/p?pref=1&x=2",
        # tracking param FIRST in the query: the next param takes
        # over the '?' slot, no dangling '&'
        "https://h.io/p?ref=1&a=2": "https://h.io/p?a=2",
        # empty query tail still trimmed
        "https://h.io/p?": "https://h.io/p",
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {
        r.u: r.c
        for r in df.select("u", canonical_url(F.col("u")).alias("c")).collect()
    }
    for raw, want in cases.items():
        assert got[raw] == want, (raw, got[raw], want)
