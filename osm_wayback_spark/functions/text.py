"""Text-analysis column expressions (training-data pipeline ops).

All pure Column math — no UDFs — and every formula is mirrored
1:1 in the DuckDB oracle SQL (__spark_entry__.oracle_sql), so
hashing/rounding choices here are constrained to functions both
engines share (md5, regexp, list lambdas).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic tiny stopword lists per language (heuristic lang-ID)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "es": ["el", "la", "de", "los", "que", "y"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
}
_EN = STOPWORDS["en"]


def words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace tokenization count."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(words(text))
    )


def token_count_bpe(text: Column) -> Column:
    """BPE-ish pre-tokenization count: word runs and individual
    punctuation marks count separately (the split most BPE vocabs
    assume). Pattern kept to the Java-regex / RE2 common subset so
    the DuckDB oracle mirrors it exactly."""
    return F.size(F.regexp_extract_all(text, F.lit(r"(\w+|[^\w\s])"), 0))


def _hits(text: Column, vocab: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(words(text), lambda w: F.array_contains(arr, F.lower(w))))


def stopword_ratio(text: Column) -> Column:
    return F.round(
        _hits(text, _EN) / F.greatest(token_count(text), F.lit(1)), 6
    )


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\.\,\;\:\!\?]", "")
    return F.round(F.length(stripped) / F.greatest(F.length(text), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Length + stopword + punctuation heuristic in [0, 1]."""
    len_score = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    return F.round(
        len_score * 0.5 + stopword_ratio(text) * 0.3 + (1.0 - punct_ratio(text)) * 0.2,
        6,
    )


def lang_id(text: Column) -> Column:
    """n-gram/stopword heuristic language ID with deterministic
    precedence en > es > de > fr > und."""
    scores = {lang: _hits(text, vocab) for lang, vocab in STOPWORDS.items()}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in ["fr", "de", "es", "en"]:  # reversed precedence
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text (md5 is byte-identical across Spark and DuckDB)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def ngrams(text: Column, n: int) -> Column:
    """NON-distinct word n-grams (repetition analysis needs the
    multiset; ``shingles`` dedups). Empty when the text has fewer
    than n words — CASE evaluates only the taken branch, so the
    slice never sees a negative length."""
    if n == 1:
        return F.when(
            F.length(F.trim(text)) == 0, F.array().cast("array<string>")
        ).otherwise(words(text))
    w = words(text)
    m = F.size(w) - (n - 1)
    acc = F.slice(w, 1, m)
    for k in range(2, n + 1):
        acc = F.zip_with(
            acc, F.slice(w, k, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(F.size(w) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )


def _top_ratio(arr: Column) -> Column:
    """max multiplicity of any element / array size (0.0 when empty).
    Pure per-row column math, zero shuffle: sort the array once and
    take the longest equal-run via a single aggregate fold —
    O(n log n) per row. (The naive distinct×filter HOF form is
    O(distinct × n) ≈ O(n²) on big documents; the DuckDB oracle keeps
    that form — same result, the oracle only runs at test scale.)"""
    s = F.array_sort(arr)

    def step(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(a["best"], run).alias("best"),
        )

    top = F.aggregate(
        s,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        step,
    )["best"]
    return F.when(F.size(arr) == 0, F.lit(0.0)).otherwise(
        F.round(top / F.size(arr), 6)
    )


def _dup_ratio(arr: Column) -> Column:
    """fraction of elements that are repeats of an earlier element
    (1 - distinct/total; 0.0 when empty)."""
    return F.when(F.size(arr) == 0, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(arr)) / F.size(arr), 6)
    )


def top_ngram_ratio(text: Column, n: int) -> Column:
    """Gopher-style repetition signal: fraction of the text's word
    n-grams taken up by the single most frequent n-gram (Rae et al.
    2021 §A1.1 'top n-gram fraction'). High values flag boilerplate
    and keyword-stuffed pages."""
    return _top_ratio(ngrams(text, n))


def dup_ngram_ratio(text: Column, n: int) -> Column:
    """Gopher-style repetition signal: fraction of word n-grams that
    are duplicates of an earlier occurrence ('duplicate n-gram
    fraction'). High values flag templated / looping text."""
    return _dup_ratio(ngrams(text, n))


# PII patterns kept to the Java-regex / RE2 common subset (no
# lookaround, no backreferences) so the DuckDB oracle applies the
# SAME patterns byte-identically.
PII_PATTERNS = {
    "email": r"[\w.+-]+@[\w-]+\.[\w.-]+",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern kind ('email'|'phone'|'ip')."""
    return F.size(
        F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), 0)
    ).cast("long")


def redact_pii(text: Column) -> Column:
    """Replace emails, phone numbers and IPv4 addresses with typed
    placeholders — the scrub step a training pipeline runs before
    tokenization. Order matters: emails first (an email must not be
    half-eaten by the IP pattern's digit runs)."""
    out = text
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles.

    Sliding-window shape (round 4): n-1 zip_with passes over n
    whole-array slices — each slice is ONE array view per row, so
    per-shingle work is just the string concat. The previous form
    (transform over an index sequence with a column-start slice per
    element) re-sliced the words array once PER SHINGLE inside an
    interpreted nested lambda — measured 3× slower at sf0.1 (3.3 s →
    1.1 s for the full shingle set). Output identical (equality
    pytest-pinned against the index form)."""
    w = words(text)
    m = F.size(w) - (n - 1)
    acc = F.slice(w, 1, m)
    for k in range(2, n + 1):
        acc = F.zip_with(
            acc, F.slice(w, k, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.array_distinct(
        F.when(F.size(w) >= n, acc).otherwise(F.array(F.concat_ws(" ", w)))
    )


# tracking params removed by canonical_url: a param is dropped iff
# its NAME (the text between the '?'/'&' delimiter and the '=')
# matches one of these, anchored — an unanchored match would fire
# inside other names ('href=', 'pref=') and merge distinct URLs.
# The pattern is kept to the Java-regex / RE2 common subset
# (non-capturing groups only — no backreferences, no lookaround) so
# the DuckDB oracle applies the SAME pattern
_TRACKING_NAME = r"^(?:utm_[^=&#]*|ref|fbclid|gclid)="


def canonical_url(url: Column) -> Column:
    """Crawl-dedup URL canonicalization (pure column math):

    1. strip the fragment;
    2. lowercase the scheme://host[:port] prefix (path/query case is
       preserved — it is significant on most servers);
    3. drop default ports (http:80, https:443) — via CASE + string
       ops, not regex backreferences (RE2 has no lookbehind and
       replacement syntax differs between engines, so the oracle
       mirrors this step exactly);
    4. remove tracking parameters (utm_*, ref, fbclid, gclid) by
       splitting the query on '&' and filtering on the ANCHORED
       param name — never a substring regex over the whole query,
       which would also hit 'href='/'pref=' — then clean the
       leftover '?'/'&' tail.

    Two URLs canonicalizing equal are crawl-duplicates in every
    pipeline that keys fetch dedup on the URL."""
    u = F.regexp_replace(url, r"#.*$", "")
    prefix = F.regexp_extract(u, r"^[^/]+://[^/?#]*", 0)
    rest = F.substring(u, F.length(prefix) + 1, F.lit(2_000_000_000))
    p = F.lower(prefix)
    p = (
        F.when(
            p.startswith("http://") & p.endswith(":80"),
            F.substring(p, 1, F.length(p) - 3),
        )
        .when(
            p.startswith("https://") & p.endswith(":443"),
            F.substring(p, 1, F.length(p) - 4),
        )
        .otherwise(p)
    )
    qpos = F.instr(rest, "?")
    path = F.when(qpos > 0, F.substring(rest, F.lit(1), qpos - 1)).otherwise(
        rest
    )
    query = F.when(
        qpos > 0, F.substring(rest, qpos + 1, F.lit(2_000_000_000))
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"), lambda x: ~x.rlike(_TRACKING_NAME)
    )
    r = F.when(qpos > 0, F.concat(path, F.lit("?"), F.array_join(kept, "&")))
    r = r.otherwise(path)
    r = F.regexp_replace(r, r"[?&]+$", "")
    return F.concat(p, r)
