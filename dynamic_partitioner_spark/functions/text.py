"""Text-analysis functions for the documents table (north-star extension
surface, SURVEY.md §2.9 — beyond the reference, which has no scalar
functions except to-string/trim, ``AvroDynamicPartitionedDatasetSink.java:120``).

Every function here is a **JVM-side Column expression** (no Python UDFs —
whole-stage codegen keeps the hot path vectorized at 100 TB) and ships
with a DuckDB-SQL twin (``*_SQL``) used by the driver's oracle so the
two definitions sit side-by-side for review.  Regex character classes
are written explicitly (``[A-Za-z0-9]`` not ``\\w``) so Java and RE2
semantics agree.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution needs it
from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- tokens

#: BPE-ish token regex: letter runs, digit runs, single non-space symbols.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def token_count(c: Column) -> Column:
    """Whitespace token count — counted as NON-whitespace runs, so
    leading/trailing tabs/newlines (which ``trim`` does not strip)
    cannot create phantom empty tokens ('a\\n' is 1 token, not 2)."""
    return F.regexp_count(c, F.lit("[^ \\t\\n\\r]+")).alias("token_count")


TOKEN_COUNT_SQL = "len(regexp_extract_all({c}, '[^ \\t\\n\\r]+'))"


def bpe_token_count(c: Column) -> Column:
    """Sub-word-ish token count via TOKEN_RE (letters/digits/symbols)."""
    return F.regexp_count(c, F.lit(TOKEN_RE))


BPE_TOKEN_COUNT_SQL = (
    "len(regexp_extract_all({c}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]'))")


# ---------------------------------------------------------------- quality

_PUNCT_RE = "[^A-Za-z0-9 \\t\\n\\r]"
#: tiny stopword list for the quality heuristic (shared with lang-id)
_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]
_STOP_RE = " (" + "|".join(_STOPWORDS) + ") "


def punct_ratio(c: Column) -> Column:
    return (F.regexp_count(c, F.lit(_PUNCT_RE)) /
            F.greatest(F.length(c), F.lit(1))).cast("double")


PUNCT_RATIO_SQL = ("CAST(len(regexp_extract_all({c}, '[^A-Za-z0-9 \\t\\n\\r]'))"
                   " AS DOUBLE) / greatest(length({c}), 1)")


def _spaced(c: Column) -> Column:
    # doubled separators + padding: every token gets its OWN leading
    # and trailing space, so non-overlapping ' word ' matches count
    # adjacent marker words correctly ('the a of' = 3, not 2 — the
    # (^| )w( |$) form consumed the separator the next word needed)
    return F.concat(F.lit(" "),
                    F.regexp_replace(F.lower(c), "[ \\t\\n\\r]+", "  "),
                    F.lit(" "))


def _spaced_sql(c: str) -> str:
    return (f"' ' || regexp_replace(lower({c}), "
            f"'[ \t\n\r]+', '  ', 'g') || ' '")


def stopword_count(c: Column) -> Column:
    return F.regexp_count(_spaced(c), F.lit(_STOP_RE))


STOPWORD_COUNT_SQL = ("len(regexp_extract_all(" + _spaced_sql("{c}")
                      + ", '" + _STOP_RE + "'))")


def quality_score(c: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: rewards mid-length docs,
    some stopwords (real prose), low symbol noise.  All-double math;
    rounding is floor(x*1e4+0.5)/1e4 rather than round() because Spark
    rounds HALF_UP and DuckDB half-even — floor on identical IEEE
    doubles is bit-reproducible across both engines."""
    ntok = token_count(c).cast("double")
    length_term = F.least(ntok / F.lit(64.0), F.lit(1.0))
    stop_term = F.least(stopword_count(c).cast("double") * 4 /
                        F.greatest(ntok, F.lit(1.0)), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 4, F.lit(1.0))
    raw = 0.4 * length_term + 0.3 * stop_term + 0.3 * punct_term
    # NULL text → NULL score (least() SKIPS null args, so the terms
    # silently became their 1.0 caps and a NULL doc scored 0.7)
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(
        F.floor(raw * 10000 + F.lit(0.5)) / 10000)


QUALITY_SCORE_SQL = (
    "CASE WHEN {c} IS NULL THEN NULL ELSE "
    "floor((0.4 * least(CAST(" + TOKEN_COUNT_SQL + " AS DOUBLE) / 64.0, 1.0) "
    "+ 0.3 * least(CAST(" + STOPWORD_COUNT_SQL + " AS DOUBLE) * 4 "
    "/ greatest(CAST(" + TOKEN_COUNT_SQL + " AS DOUBLE), 1.0), 1.0) "
    "+ 0.3 * (1.0 - least((" + PUNCT_RATIO_SQL + ") * 4, 1.0))) * 10000 + 0.5) "
    "/ 10000 END")


# ------------------------------------------------- C4/Gopher-style signals
#
# Heuristic corpus-filter signals in the C4 / Gopher tradition (mean
# word length, symbol-to-word ratio, case/digit ratios, repeated-word
# fraction).  Only constructs RE2 also supports are used (no
# backreferences — DuckDB's regex engine lacks them), so every signal
# has an exact SQL twin.

_WS_RUN = "[ \\t\\n\\r]+"


def mean_word_length(c: Column) -> Column:
    """Average characters per whitespace token (Gopher gates docs with
    mean word length outside [3, 10])."""
    nonspace = F.length(F.regexp_replace(c, _WS_RUN, ""))
    return (nonspace.cast("double")
            / F.greatest(token_count(c), F.lit(1)).cast("double"))


MEAN_WORD_LENGTH_SQL = (
    "CAST(length(regexp_replace({c}, '[ \\t\\n\\r]+', '', 'g')) AS DOUBLE)"
    " / greatest(" + TOKEN_COUNT_SQL + ", 1)")


def symbol_word_ratio(c: Column) -> Column:
    """Symbols per word (Gopher: high #/… density marks boilerplate)."""
    return (F.regexp_count(c, F.lit(_PUNCT_RE)).cast("double")
            / F.greatest(token_count(c), F.lit(1)).cast("double"))


SYMBOL_WORD_RATIO_SQL = (
    "CAST(len(regexp_extract_all({c}, '[^A-Za-z0-9 \\t\\n\\r]')) AS DOUBLE)"
    " / greatest(" + TOKEN_COUNT_SQL + ", 1)")


def uppercase_ratio(c: Column) -> Column:
    return (F.regexp_count(c, F.lit("[A-Z]")).cast("double")
            / F.greatest(F.length(c), F.lit(1)))


UPPERCASE_RATIO_SQL = ("CAST(len(regexp_extract_all({c}, '[A-Z]')) AS DOUBLE)"
                       " / greatest(length({c}), 1)")


def digit_ratio(c: Column) -> Column:
    return (F.regexp_count(c, F.lit("[0-9]")).cast("double")
            / F.greatest(F.length(c), F.lit(1)))


DIGIT_RATIO_SQL = ("CAST(len(regexp_extract_all({c}, '[0-9]')) AS DOUBLE)"
                   " / greatest(length({c}), 1)")


def word_repetition_ratio(c: Column) -> Column:
    """Fraction of tokens that repeat an earlier token (1 − distinct/
    total) — the cheap duplicate-content signal (Gopher's repeated-
    n-gram family, at n=1).

    Tokens are NON-whitespace runs (the :func:`token_count`
    convention): the old split-on-trim form left a phantom empty
    token for any doc with leading/trailing tabs/newlines (``trim``
    strips only spaces), which counted as an extra distinct "word"
    and systematically under-reported repetition — 'a a\\n' scored
    0.3333 instead of 0.5 on BOTH engine sides, so a Gopher-style
    gate passed boilerplate it should reject (r15 review).  An empty
    or whitespace-only doc scores 0.0 (nothing repeats)."""
    toks = F.regexp_extract_all(F.lower(c), F.lit(_NONWS_RUN), 0)
    return (F.when(F.size(toks) == 0, F.lit(0.0))
            .otherwise(F.lit(1.0)
                       - F.size(F.array_distinct(toks)).cast("double")
                       / F.size(toks)))


_NONWS_RUN = "[^ \\t\\n\\r]+"

WORD_REPETITION_RATIO_SQL = (
    "CASE WHEN len(regexp_extract_all(lower({c}), '[^ \\t\\n\\r]+')) = 0"
    " THEN 0.0 ELSE"
    " 1.0 - CAST(len(list_distinct(regexp_extract_all(lower({c}),"
    " '[^ \\t\\n\\r]+'))) AS DOUBLE)"
    " / len(regexp_extract_all(lower({c}), '[^ \\t\\n\\r]+')) END")


# ---------------------------------------------------------------- lang id

#: marker words per language; CJK presence short-circuits to zh.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "was"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "les", "des", "et", "est"],
}
_CJK_RE = "[\\x{4e00}-\\x{9fff}]"


def _marker_count(c: Column, lang: str) -> Column:
    pat = " (" + "|".join(_LANG_MARKERS[lang]) + ") "
    return F.regexp_count(_spaced(c), F.lit(pat))


def lang_id(c: Column) -> Column:
    """Heuristic language ID: CJK chars → zh, else argmax of marker-word
    hits with fixed tiebreak order en>de>es>fr, 'und' (undetermined)
    when nothing matches."""
    en, de = _marker_count(c, "en"), _marker_count(c, "de")
    es, fr = _marker_count(c, "es"), _marker_count(c, "fr")
    # NULL text → NULL lang (every WHEN is three-valued-unknown for
    # NULL counts, which used to fall through to the 'fr' ELSE)
    return (F.when(c.isNull(), F.lit(None).cast("string"))
            .when(F.regexp_count(c, F.lit(_CJK_RE)) > 0, F.lit("zh"))
            .when((en + de + es + fr) == 0, F.lit("und"))
            .when((en >= de) & (en >= es) & (en >= fr), F.lit("en"))
            .when((de >= es) & (de >= fr), F.lit("de"))
            .when(es >= fr, F.lit("es"))
            .otherwise(F.lit("fr")))


def _marker_count_sql(c: str, lang: str) -> str:
    pat = " (" + "|".join(_LANG_MARKERS[lang]) + ") "
    return f"len(regexp_extract_all({_spaced_sql(c)}, '{pat}'))"


def lang_id_sql(c: str) -> str:
    en, de = _marker_count_sql(c, "en"), _marker_count_sql(c, "de")
    es, fr = _marker_count_sql(c, "es"), _marker_count_sql(c, "fr")
    return (f"CASE WHEN {c} IS NULL THEN NULL "
            f"WHEN len(regexp_extract_all({c}, '{_CJK_RE}')) > 0 THEN 'zh' "
            f"WHEN ({en} + {de} + {es} + {fr}) = 0 THEN 'und' "
            f"WHEN {en} >= {de} AND {en} >= {es} AND {en} >= {fr} THEN 'en' "
            f"WHEN {de} >= {es} AND {de} >= {fr} THEN 'de' "
            f"WHEN {es} >= {fr} THEN 'es' ELSE 'fr' END")


# ------------------------------------------------------ cleaning / PII-ish
#
# Standard web-corpus cleaning: whitespace/control normalization and
# URL/email detection+redaction (the C4 recipe runs exactly these before
# dedup).  RE2-safe patterns only, so each has an exact DuckDB twin.

_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
_URL_RE = "(?i)https?://[^ \\t\\n\\r]+"
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"


def normalize_ws(c: Column) -> Column:
    """Strip control chars, collapse whitespace runs to single spaces,
    trim — the canonical pre-dedup text normalization."""
    no_ctrl = F.regexp_replace(c, _CTRL_RE, "")
    return F.trim(F.regexp_replace(no_ctrl, "[ \\t\\n\\r]+", " "))


NORMALIZE_WS_SQL = (
    "trim(regexp_replace(regexp_replace({c}, "
    "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'), "
    "'[ \\t\\n\\r]+', ' ', 'g'))")


def url_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit(_URL_RE))


URL_COUNT_SQL = "len(regexp_extract_all({c}, '(?i)https?://[^ \\t\\n\\r]+'))"


def email_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit(_EMAIL_RE))


EMAIL_COUNT_SQL = ("len(regexp_extract_all({c}, "
                   "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))")


def redact(c: Column) -> Column:
    """Replace URLs with <URL> then emails with <EMAIL> (URL first —
    a URL can contain an @ userinfo part; an email never contains
    ``://``)."""
    no_url = F.regexp_replace(c, _URL_RE, "<URL>")
    return F.regexp_replace(no_url, _EMAIL_RE, "<EMAIL>")


REDACT_SQL = (
    "regexp_replace(regexp_replace({c}, '(?i)https?://[^ \\t\\n\\r]+', "
    "'<URL>', 'g'), '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', "
    "'<EMAIL>', 'g')")


# ----------------------------------------------------------- fingerprint

def doc_fingerprint(c: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.
    (The rolling/shingle variant lives in operators/dedup.py where it
    feeds MinHash.)"""
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), "[ \\t\\n\\r]+", " "))


DOC_FINGERPRINT_SQL = ("md5(regexp_replace(lower(trim({c})), "
                       "'[ \\t\\n\\r]+', ' ', 'g'))")


# ---------------------------------------------------------------- simhash

SIMHASH_BITS = 32


def simhash(c: Column) -> Column:
    """32-bit SimHash over whitespace tokens.

    Per token, the 32 hex nibbles of md5(token) vote: high bit of
    nibble *j* set → +1 on bit *j*, else −1; document bit *j* is 1 when
    the vote sum is positive.  Pure Column expressions (aggregate over
    the token array), no shuffle, no UDF — and nibble-level md5 votes
    are reproducible verbatim in the DuckDB oracle twin.
    """
    toks = F.split(F.trim(F.lower(c)), "[ \\t\\n\\r]+")
    hexes = F.transform(toks, lambda t: F.substring(F.md5(t), 1, SIMHASH_BITS))

    def _vote(j: int):
        # closure factory: pyspark counts lambda params to pick the HOF
        # arity, so a `j=j` default would turn this into a 3-arg lambda
        return lambda acc, h: acc + F.when(
            F.substring(h, j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"),
            F.lit(1)).otherwise(F.lit(-1))

    total = F.lit(0)
    for j in range(SIMHASH_BITS):
        vote = F.aggregate(hexes, F.lit(0), _vote(j))
        total = total + F.when(vote > 0, F.lit(2 ** j)).otherwise(F.lit(0))
    return total.cast("bigint")


def simhash_batched(c: Column) -> Column:
    """Arrow-batched :func:`simhash` — bit-identical results (integer
    votes, no floating point), ~one md5 per token instead of 32
    interpreted ``aggregate`` passes over the token-hash array per row
    (Spark evaluates higher-order functions outside codegen, so the
    Column form is O(32·tokens) interpreted — the same anti-pattern
    measured on the cosine path).  Use this on hot paths; the Column
    form remains as the readable spec and the DuckDB twin
    (:func:`simhash_sql`) stays the oracle."""
    ws = re.compile(r"[ \t\n\r]+")
    weights = (1 << np.arange(SIMHASH_BITS, dtype=np.int64))

    @F.pandas_udf("bigint")
    def _simhash(s: pd.Series) -> pd.Series:
        out: list[int] = []
        for text in s:
            if text is None:
                # parity with the Column form and the DuckDB twin: a NULL
                # document folds to 0 (every CASE falls to its ELSE 0)
                out.append(0)
                continue
            # strip(' ') not strip(): Spark/DuckDB trim() remove only
            # 0x20 spaces, so a trailing \n must keep producing the
            # same phantom empty token here as in the spec/oracle forms
            toks = ws.split(text.lower().strip(" "))
            raw = b"".join(hashlib.md5(t.encode("utf-8")).digest()
                           for t in toks)
            digs = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 16)
            nibs = np.empty((digs.shape[0], SIMHASH_BITS), dtype=np.uint8)
            nibs[:, 0::2] = digs >> 4          # hexdigest char 2k
            nibs[:, 1::2] = digs & 0x0F        # hexdigest char 2k+1
            # (+1 if nibble>=8 else -1) summed per bit position
            votes = (nibs >= 8).sum(0, dtype=np.int64) * 2 - digs.shape[0]
            out.append(int(weights[votes > 0].sum()))
        # int64, not object: every value fits (max 2^32 - 1), and the
        # object path paid per-element boxing on the hot dedup path
        # this UDF exists to accelerate (r13 review)
        return pd.Series(out, dtype="int64")

    return _simhash(c)


def simhash_sql(c: str) -> str:
    tok_list = f"string_split_regex(trim(lower({c})), '[ \\t\\n\\r]+')"
    bits = []
    for j in range(SIMHASH_BITS):
        vote = (f"list_sum(list_transform({tok_list}, t -> CASE WHEN "
                f"substr(md5(t), {j + 1}, 1) IN ('8','9','a','b','c','d','e','f') "
                f"THEN 1 ELSE -1 END))")
        bits.append(f"CASE WHEN {vote} > 0 THEN {2 ** j} ELSE 0 END")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


# ------------------------------------------------------------ URL canon

_TRACK = r"(utm_[a-z0-9]*|fbclid|gclid|msclkid|ref)"


def canonicalize_url(c: Column) -> Column:
    """Canonical form of a URL for dedup/aggregation:

    1. the whole AUTHORITY lowercased (scheme, any userinfo, host —
       path/query case preserved).  The canonical form is a DEDUP
       KEY, not a usable URL: userinfo is case-sensitive per RFC
       3986, so treat the output as an identity, never as an address
       (r15 review — the lowercasing deliberately collapses
       ``Alice@h`` and ``alice@h``),
    2. the scheme's OWN default port dropped (``:80`` for http,
       ``:443`` for https — ``https://h:80/`` is a distinct resource
       and keeps its port), including behind a userinfo whose
       password part contains ``:`` (r15 review),
    3. fragment (``#...``) dropped,
    4. tracking params (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``,
       ``ref``) dropped without ever touching the ``?`` separator:
       non-leading params strip with their ``&`` — a consecutive RUN
       strips in one pass, and up to 4 SEPARATED groups (tracking
       params split apart by surviving params) are handled; beyond
       that the extras remain (documented bound; crawl-shaped URLs
       carry their tracking params consecutively).  A leading param
       followed by survivors promotes the next param behind ``?``; a
       query that was ONLY tracking params disappears.  Ampersands in
       the path (no query present) are never rewritten.
    5. dangling ``?`` dropped; a trailing ``/`` dropped only when the
       URL has NO query (a ``/`` ending a query VALUE is part of that
       value — stripping it collapsed distinct resources, r15
       review).

    Pure ``regexp_replace`` chain — codegen, RE2-safe (no lookaround,
    so the DuckDB twin applies the identical patterns; only the
    replacement syntax differs, ``$1`` vs ``\\1``).
    """
    u = F.concat(
        F.lower(F.regexp_extract(c, r"^((?i)https?://[^/?#]*)", 1)),
        F.regexp_replace(c, r"^(?i)https?://[^/?#]*", ""))
    u = F.regexp_replace(
        u, r"^(http://(?:[^/?#@]*@)?[^/?#:]*):80([/?#][^\n]*)?\z",
        r"$1$2")
    u = F.regexp_replace(
        u, r"^(https://(?:[^/?#@]*@)?[^/?#:]*):443([/?#][^\n]*)?\z",
        r"$1$2")
    u = F.regexp_replace(u, r"#[^\n]*\z", "")
    for _ in range(4):
        # (?:...)+ collapses a consecutive run in ONE pass; the ^
        # anchor bounds each pass to one match, so the 4 passes handle
        # 4 SEPARATED groups (r15 review: the old single-param form
        # capped at 4 params total — the 5-param GA set left extras)
        u = F.regexp_replace(
            u, rf"^([^?#]*\?[^#]*?)(?:&{_TRACK}=[^&#]*)+", r"$1")
    u = F.regexp_replace(u, rf"\?{_TRACK}=[^&#]*&", "?")
    u = F.regexp_replace(u, rf"\?{_TRACK}=[^&#]*\z", "")
    u = F.regexp_replace(u, r"\?\z", "")
    u = F.regexp_replace(u, r"^([^?#]*[^/])/\z", r"$1")
    return u


def _canon_url_sql(c: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` (same patterns, same
    order; RE2 replacement syntax)."""
    # || not concat(): DuckDB concat() ignores NULL args (NULL url
    # would canonicalize to ''), the || operator propagates like Spark
    u = (f"(lower(regexp_extract({c}, '^((?i)https?://[^/?#]*)', 1)) || "
         f"regexp_replace({c}, '^(?i)https?://[^/?#]*', ''))")
    u = (f"regexp_replace({u}, "
         f"'^(http://(?:[^/?#@]*@)?[^/?#:]*):80([/?#][^\\n]*)?\\z', "
         f"'\\1\\2')")
    u = (f"regexp_replace({u}, "
         f"'^(https://(?:[^/?#@]*@)?[^/?#:]*):443([/?#][^\\n]*)?\\z', "
         f"'\\1\\2')")
    u = f"regexp_replace({u}, '#[^\\n]*\\z', '')"
    # anchored to a real '?' (r13 review: the unanchored &-rule ate
    # path text); anchored rules match once per call and the (?:...)+
    # run-collapse mirrors the Spark chain exactly — 4 passes handle
    # 4 SEPARATED tracking groups, a consecutive run strips in one
    for _ in range(4):
        u = (f"regexp_replace({u}, "
             f"'^([^?#]*\\?[^#]*?)(?:&{_TRACK}=[^&#]*)+', '\\1')")
    # 'g' matters: Spark's regexp_replace is always global, and a
    # literal '?' inside a query value gives this rule a second match
    u = f"regexp_replace({u}, '\\?{_TRACK}=[^&#]*&', '?', 'g')"
    u = f"regexp_replace({u}, '\\?{_TRACK}=[^&#]*\\z', '')"
    u = f"regexp_replace({u}, '\\?\\z', '')"
    u = f"regexp_replace({u}, '^([^?#]*[^/])/\\z', '\\1')"
    return u


CANON_URL_SQL = _canon_url_sql("{c}")


# ------------------------------------------------------------ PII redact

# (count-column, pattern, replacement) — ordered so no earlier
# replacement can create or destroy a later match on the injected
# formats; every pattern is RE2-safe (no lookaround) so the DuckDB twin
# runs the IDENTICAL strings.  Formats covered are the canonical US-ish
# shapes ((555) 123-4567 phones, 123-45-6789 SSNs, dotted-quad IPs,
# 4-4-4-4 card numbers); real pipelines extend the table, the plumbing
# (count → redact → both-engine parity) stays the same.
PII_SPECS: list[tuple[str, str, str]] = [
    ("n_cc", r"\b\d{4} \d{4} \d{4} \d{4}\b", "<CC>"),
    ("n_phone", r"\(\d{3}\) \d{3}-\d{4}", "<PHONE>"),
    ("n_ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("n_ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_counts(c: Column) -> list[Column]:
    """One LONG count column per PII class (counted on the RAW text,
    before any redaction, so classes can't shadow each other)."""
    return [F.regexp_count(c, F.lit(pat)).cast("long").alias(name)
            for name, pat, _ in PII_SPECS]


def redact_pii(c: Column) -> Column:
    """All PII classes replaced by their ``<TAG>`` markers, applied in
    :data:`PII_SPECS` order — a codegen ``regexp_replace`` chain."""
    u = c
    for _, pat, tag in PII_SPECS:
        u = F.regexp_replace(u, pat, tag)
    return u


def pii_counts_sql(c: str) -> list[str]:
    """DuckDB twins of :func:`pii_counts` (same patterns verbatim)."""
    return [f"CAST(length(regexp_extract_all({c}, '{pat}')) AS BIGINT) "
            f"AS {name}" for name, pat, _ in PII_SPECS]


def redact_pii_sql(c: str) -> str:
    """DuckDB twin of :func:`redact_pii`."""
    u = c
    for _, pat, tag in PII_SPECS:
        u = f"regexp_replace({u}, '{pat}', '{tag}', 'g')"
    return u


# ------------------------------------------------------------ html strip

#: boilerplate-removal chain, applied in order.  RE2-safe patterns only
#: (non-greedy + inline (?is) flags work identically in Java regex and
#: DuckDB's RE2), so the SQL twin runs the very same strings.
HTML_BLOCK_RE = r"(?is)<(script|style)[^>]*>.*?</(script|style)>"
HTML_COMMENT_RE = r"(?s)<!--.*?-->"
HTML_TAG_RE = r"<[^>]+>"
_WS_RE = r"[ \t\r\n]+"

#: the handful of entities worth decoding without an HTML parser —
#: applied AFTER tag removal so a decoded ``&lt;`` can never re-form a
#: strippable tag (entity-smuggling would otherwise round-trip '<').
#: ``&amp;`` decodes LAST: running it first would double-decode
#: double-escaped text ("&amp;lt;" must yield the literal "&lt;", not
#: "<" — code-review r6)
HTML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"),
                 ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "),
                 ("&amp;", "&")]


def strip_html(c: Column) -> Column:
    """Markup boilerplate removal — the first pass of every web-corpus
    pretraining pipeline: script/style blocks and comments die with
    their content, remaining tags become spaces, the common entities
    decode, whitespace collapses.  A codegen ``regexp_replace`` +
    ``replace`` chain (no Python, no HTML parser — by design: at
    100 TB the 95% case is this chain; documents that need a real DOM
    walk are the job of a mapInPandas stage with an actual parser)."""
    u = F.regexp_replace(c, HTML_BLOCK_RE, " ")
    u = F.regexp_replace(u, HTML_COMMENT_RE, " ")
    u = F.regexp_replace(u, HTML_TAG_RE, " ")
    for ent, rep in HTML_ENTITIES:
        u = F.replace(u, F.lit(ent), F.lit(rep))
    u = F.regexp_replace(u, _WS_RE, " ")
    return F.trim(u)


def strip_html_sql(c: str) -> str:
    """DuckDB twin of :func:`strip_html` (same patterns verbatim)."""
    u = f"regexp_replace({c}, '{HTML_BLOCK_RE}', ' ', 'g')"
    u = f"regexp_replace({u}, '{HTML_COMMENT_RE}', ' ', 'g')"
    u = f"regexp_replace({u}, '{HTML_TAG_RE}', ' ', 'g')"
    for ent, rep in HTML_ENTITIES:
        lit = rep.replace("'", "''")
        u = f"replace({u}, '{ent}', '{lit}')"
    u = f"regexp_replace({u}, '{_WS_RE}', ' ', 'g')"
    return f"trim({u})"


def html_tag_count(c: Column) -> Column:
    """Number of markup tags a strip pass would remove (comments and
    block contents count once per tag)."""
    return F.regexp_count(c, F.lit(HTML_TAG_RE))


HTML_TAG_COUNT_SQL = (
    "CAST(length(regexp_extract_all({c}, '" + HTML_TAG_RE
    + "')) AS BIGINT)")


# ------------------------------------------------------- format skeleton

#: skeleton character budget — enough to separate templates, small
#: enough that the groupBy key stays cheap to shuffle at corpus scale
SKELETON_LEN = 80


def format_skeleton(c: Column) -> Column:
    """Structural fingerprint for template/boilerplate detection: the
    text with letter runs collapsed to ``a``, digit runs to ``9`` and
    whitespace runs to one space, truncated to :data:`SKELETON_LEN`
    chars.  Near-identical boilerplate (cookie banners, listing pages,
    auto-generated forum shells) collapses to ONE skeleton even when
    names/numbers differ, so a groupBy on the skeleton surfaces
    template families that no exact- or near-dup pass catches — the
    complement to MinHash in a web-corpus curation stack.  Pure
    codegen ``regexp_replace`` chain; the skeleton is a short string,
    so the follow-up groupBy shuffles a bounded key regardless of
    document size."""
    u = F.lower(c)
    u = F.regexp_replace(u, "[0-9]+", "9")
    u = F.regexp_replace(u, "[a-z]+", "a")
    u = F.regexp_replace(u, "[ \\t\\n\\r]+", " ")
    return F.substring(F.trim(u), 1, SKELETON_LEN)


def format_skeleton_sql(c: str) -> str:
    """DuckDB twin of :func:`format_skeleton` (same patterns, same
    truncation)."""
    u = f"lower({c})"
    u = f"regexp_replace({u}, '[0-9]+', '9', 'g')"
    u = f"regexp_replace({u}, '[a-z]+', 'a', 'g')"
    u = f"regexp_replace({u}, '[ \\t\\n\\r]+', ' ', 'g')"
    return f"substr(trim({u}), 1, {SKELETON_LEN})"


# ----------------------------------------------------------- readability

#: sentence terminators (runs count once: "?!" is one boundary)
_SENT_RE = "[.!?]+"
#: vowel-group runs — the standard cheap syllable proxy
_SYL_RE = "[aeiouyAEIOUY]+"


def readability_counts(c: Column) -> tuple[Column, Column, Column]:
    """(words, sentences, syllable-proxy) counts for Flesch-style
    scoring — all three are regexp run counts (codegen, RE2-safe)."""
    # token_count IS the word count — one definition (r13 review: an
    # inline copy here could silently desynchronize Flesch from the
    # module's token convention)
    words = token_count(c)
    sents = F.regexp_count(c, F.lit(_SENT_RE))
    syls = F.regexp_count(c, F.lit(_SYL_RE))
    return words, sents, syls


def flesch_score(c: Column) -> Column:
    """Flesch reading-ease score (Flesch 1948, public formula):
    ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)``
    with vowel-group runs as the syllable proxy — the standard cheap
    readability gate in corpus quality stacks.  Both ratios are
    divisions of exact integer counts, so the score is three IEEE ops
    on identical inputs — bit-identical cross-engine after round4.
    A text with words but no terminal punctuation counts as ONE
    sentence (the usual convention — title-like and list-like corpora
    would otherwise all score NULL); NULL only when there are no
    words (formula undefined; a 0-denominator raises under ANSI)."""
    words, sents, syls = readability_counts(c)
    sents_eff = F.greatest(sents, F.lit(1))
    score = (F.lit(206.835)
             - F.lit(1.015) * (words / sents_eff)
             - F.lit(84.6) * (syls / words))
    return F.when(words > 0, score)


def flesch_score_sql(c: str) -> str:
    """DuckDB twin of :func:`flesch_score` (same counts, same three
    IEEE ops)."""
    words = TOKEN_COUNT_SQL.format(c=c)   # byte-identical rendering
    sents = f"greatest(len(regexp_extract_all({c}, '{_SENT_RE}')), 1)"
    syls = f"len(regexp_extract_all({c}, '{_SYL_RE}'))"
    return (f"CASE WHEN {words} > 0 THEN "
            f"206.835 - 1.015 * ({words} / CAST({sents} AS DOUBLE)) "
            f"- 84.6 * ({syls} / CAST({words} AS DOUBLE)) END")
