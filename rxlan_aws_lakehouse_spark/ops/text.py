"""Text analysis operators for training-data pipelines.

All operators are pure column expressions (JVM-side, whole-stage codegen) —
no Python in the row path. Tokenization is regex-based (`\\S+`), quality
metrics are arithmetic over token arrays, language-ID is a stopword-ratio
heuristic, and fingerprints are md5 / polynomial rolling hashes.

Every expression here has an exactly-equivalent ANSI SQL form (DuckDB list
lambdas + md5), which is what makes these operators oracle-checkable; the
shared constants live in this module so Spark plan and oracle SQL can't drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = r"\S+"

# Polynomial rolling-hash constants (shared with the SQL oracle).
HASH_MOD = 1_000_000_007
TOKEN_MOD = 1_000_003
HASH_BASE = 31

# Stopword sets for the language-ID heuristic.
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization as an array column."""
    return F.regexp_extract_all(col, F.lit(TOKEN_RE), 0)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex digits of md5.

    Engine-portable (md5 is identical everywhere), unlike murmur-based
    ``F.hash`` whose seeds/variants differ across engines.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_hash(col: Column) -> Column:
    """Small token hash used as the rolling-hash digit."""
    return md5_long(col) % TOKEN_MOD


def rolling_fingerprint(text_col: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    token hashes, mod 1e9+7. acc stays < 2^35, so no overflow."""
    toks = tokens(text_col)
    digits = F.transform(toks, lambda t: token_hash(t))
    return F.aggregate(
        digits,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * HASH_BASE + x) % HASH_MOD,
    )


def normalized_fingerprint(text_col: Column) -> Column:
    """Order-sensitive but whitespace/case-insensitive md5 fingerprint —
    the canonical exact-dedup key after normalization."""
    norm = F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " "))
    return F.md5(norm)


def quality_metrics(text_col: Column) -> dict[str, Column]:
    """Per-document quality signals. Returns named columns; callers select.

    quality_score blends lexical diversity with a length prior — a stand-in
    for the fastText-style quality classifiers used in corpus curation.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_chars = F.length(text_col)
    # total token chars = chars minus whitespace
    tok_chars = F.length(F.regexp_replace(text_col, r"\s+", ""))
    uniq_ratio = F.when(n_tok > 0, n_uniq.cast("double") / n_tok).otherwise(F.lit(0.0))
    avg_tok_len = F.when(n_tok > 0, tok_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    score = F.round(
        0.5 * uniq_ratio + 0.5 * F.least(F.lit(1.0), n_tok.cast("double") / 50.0), 4
    )
    return {
        "n_tokens": n_tok,
        "n_uniq_tokens": n_uniq,
        "n_chars_calc": n_chars,
        "uniq_ratio": F.round(uniq_ratio, 4),
        "avg_token_len": F.round(avg_tok_len, 4),
        "quality_score": score,
    }


def lang_scores(text_col: Column) -> dict[str, Column]:
    """Stopword-hit counts per language over the token array."""
    toks = tokens(text_col)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        wl = list(words)
        out[lang] = F.size(
            F.filter(toks, lambda t: F.lower(t).isin(wl))
        )
    return out


def predict_lang(text_col: Column) -> Column:
    """Argmax over stopword-hit counts; ties resolve in the fixed language
    order en > es > fr > de; zero hits everywhere -> 'unk'.

    Expressed as a CASE chain so the SQL oracle can mirror it exactly.
    """
    s = lang_scores(text_col)
    en, es, fr, de = s["en"], s["es"], s["fr"], s["de"]
    return (
        F.when((en >= es) & (en >= fr) & (en >= de) & (en > 0), F.lit("en"))
        .when((es >= fr) & (es >= de) & (es > 0), F.lit("es"))
        .when((fr >= de) & (fr > 0), F.lit("fr"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("unk"))
    )


# PII scrubbing: engine-portable patterns (no lookarounds; work in Java
# regex and RE2 alike). Corpus-curation redaction before training.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
}


def pii_counts(text_col: Column) -> dict[str, Column]:
    """Matches per PII class (size of regexp_extract_all)."""
    return {
        name: F.size(F.regexp_extract_all(text_col, F.lit(pat), 0))
        for name, pat in PII_PATTERNS.items()
    }


def scrub_pii(text_col: Column) -> Column:
    """Redact every PII class with a typed placeholder token."""
    out = text_col
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


# ---------------------------------------------------------------------------
# SQL oracle fragments (DuckDB dialect) — same constants, same semantics.
# ---------------------------------------------------------------------------

SQL_TOKENS = r"regexp_extract_all({c}, '\S+')"
SQL_MD5_LONG = "CAST(('0x' || substr(md5({c}), 1, 15)) AS BIGINT)"
SQL_TOKEN_HASH = f"({SQL_MD5_LONG} % {TOKEN_MOD})"
SQL_ROLLING_FP = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(" + SQL_TOKENS + ", t -> " + SQL_TOKEN_HASH.format(c="t") + ")), "
    f"(acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD})"
)
SQL_NORM_FP = r"md5(trim(regexp_replace(lower({c}), '\s+', ' ', 'g')))"


def sql_lang_score(lang: str, c: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    toks = SQL_TOKENS.format(c=c)
    return f"len(list_filter({toks}, t -> lower(t) IN ({words})))"


# -- markup stripping (web-corpus cleaning) --------------------------------

# Entities the unescaper handles; order matters (&amp; LAST on decode so
# double-escaped text resolves one level per pass, standard single-pass
# semantics).
_HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def strip_markup(col: Column) -> Column:
    """HTML/markup removal for web-crawl text (the trafilatura/justext
    step reduced to its engine-side core): drop <script>/<style> elements
    WITH their content, drop comments, replace every remaining tag with a
    space (so adjacent words don't fuse), unescape the common entities,
    and collapse whitespace. Pure regexp column expressions — codegen'd,
    no Python in the row path, linear in text size."""
    out = col
    # two passes, no backreference: the SQL twin runs on RE2 (DuckDB),
    # which has no \1
    for el in ("script", "style"):
        out = F.regexp_replace(
            out, rf"(?is)<{el}\b[^>]*>.*?</{el}\s*>", " "
        )
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        out = F.regexp_replace(out, ent, ch)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def tag_count(col: Column) -> Column:
    """How many tags the stripper would remove (markup-density signal —
    crawl-quality filters cut on this)."""
    return F.size(F.regexp_extract_all(col, F.lit(r"(?s)<[^>]+>"), 0))


def sql_strip_markup(c: str) -> str:
    """DuckDB twin of ``strip_markup`` (same regexes; DuckDB flags go in
    the 4th arg, 's' via inline (?s))."""
    out = c
    for el in ("script", "style"):
        out = (
            f"regexp_replace({out}, "
            f"'(?is)<{el}\\b[^>]*>.*?</{el}\\s*>', ' ', 'g')"
        )
    out = f"regexp_replace({out}, '(?s)<!--.*?-->', ' ', 'g')"
    out = f"regexp_replace({out}, '(?s)<[^>]+>', ' ', 'g')"
    for ent, ch in _HTML_ENTITIES:
        lit = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
