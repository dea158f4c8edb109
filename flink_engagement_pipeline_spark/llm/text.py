"""Text-analysis Column helpers: normalization, shingling, token
counting, quality scoring, language-ID, fingerprinting.

Everything here is a pure JVM-side Column expression (whole-stage
codegen, no Python in the hot path). Each helper documents its DuckDB
oracle equivalent; integer-derived ratios (count/count) are the only
float math, so results are bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language stopword lists for the heuristic language-ID.
# Membership tests only — identical literal lists appear in the oracle
# SQL (plans/queries_llm.py builds both from these constants).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "es": ("el", "los", "las", "y", "que", "en", "un", "una", "es", "por"),
    "fr": ("le", "les", "des", "et", "pour", "dans", "au", "avec", "sur", "une"),
}

# BPE-ish tokenizer: letter runs | digit runs | single other non-space.
# Kept to a syntax subset valid in both Java regex and DuckDB's RE2.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def normalize(text: Column | str) -> Column:
    """lower + trim + collapse whitespace.
    Oracle: ``regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')``.

    Cross-engine unicode boundary (pinned in
    tests/test_llm_ops.py::test_normalize_unicode_parity): Latin
    accents, Polish, ß, and all whitespace classes normalize
    identically in Spark (Java) and DuckDB; the ONE known divergence
    is dotted-capital İ (U+0130), which Java lowercases to
    ``i + U+0307`` while DuckDB emits plain ``i``. Corpora where that
    matters need an explicit NFC/transliteration pass before
    fingerprinting."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def words(text: Column | str) -> Column:
    """Whitespace tokens of the normalized text.
    Oracle: ``string_split(<norm>, ' ')``."""
    return F.split(normalize(text), " ")


def bigrams_list(ws: Column) -> Column:
    """NON-distinct word bigram list (repetition metrics need the
    multiset — ``shingles()`` deliberately dedups and cannot be used
    here). Zip the token array with its 1-shifted slice; the zip pads
    the tail with one null pair, and ``concat`` (never ``concat_ws``,
    which silently drops nulls) turns it into a null entry the filter
    removes. Oracle: ``list_transform(range(1, len(ws)), i ->
    ws[i] || ' ' || ws[i+1])``."""
    tail = F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0)))
    zipped = F.zip_with(ws, tail, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.filter(zipped, lambda g: g.isNotNull())


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (order-insensitive set for
    Jaccard/MinHash). Oracle: ``list_distinct(list_transform(range(1,
    len(ws)-(n-2)), i -> ws[i]||' '||...))``; docs shorter than n words
    fall back to the single whole-text shingle.

    Built by zipping the token array with its d-shifted slices rather
    than per-index ``element_at`` lookups: higher-order-function lambda
    bodies get no codegen subexpression elimination, so an
    ``element_at(ws, i+d)`` gram would re-evaluate the whole
    ``split(regexp_replace(...))`` subtree ~3x per shingle (~150x per
    row — measured 34 ms/doc at sf0.01). The zip form references ``ws``
    only ~n+2 times per row regardless of document length.
    """
    ws = words(text)
    shifted = [ws] + [
        F.slice(ws, d + 1, F.greatest(F.size(ws) - d, F.lit(0)))
        for d in range(1, n)
    ]
    # trailing zip entries have null fields (shorter slices) — cut to
    # the size(ws)-n+1 true gram positions before concatenating
    z = F.slice(F.arrays_zip(*shifted), 1, F.size(ws) - (n - 1))
    grams = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(d)] for d in range(n)])
    )
    return F.when(F.size(ws) >= n, F.array_distinct(grams)).otherwise(
        F.array(normalize(text))
    )


def ws_token_count(text: Column | str) -> Column:
    """Whitespace token count. Oracle: ``len(string_split(<norm>, ' '))``."""
    return F.size(words(text))


def re_token_count(text: Column | str) -> Column:
    """BPE-ish regex token count.
    Oracle: ``len(regexp_extract_all(text, TOKEN_RE))``."""
    c = F.col(text) if isinstance(text, str) else text
    # idx=0 = whole match (the pattern has no capture groups)
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Count of tokens in the language's stopword list.
    Oracle: ``len(list_filter(string_split(<norm>,' '), w -> w IN (...)))``."""
    sw = STOPWORDS[lang]
    return F.size(F.filter(words(text), lambda w: w.isin(*sw)))


# The packed counter below folds all four languages' hit counts into
# one 16-bit-per-lang long in a SINGLE pass over the token array. That
# is exact only while no token belongs to two lists (a shared token
# would be credited to the first matching language instead of both).
assert sum(map(len, STOPWORDS.values())) == len(
    {t for sw in STOPWORDS.values() for t in sw}
), "stopword lists must be pairwise disjoint for packed counting"

_PACK_SHIFT = {"en": 0, "de": 16, "es": 32, "fr": 48}


def stopword_hits_all(text: Column | str) -> dict[str, Column]:
    """All four languages' stopword hit counts from ONE traversal of
    the token array: each token contributes a 16-bit-shifted 1 to a
    packed long accumulator (a when-chain short-circuits the list
    membership tests), and the per-language counts shift back out.
    Identical counts to four ``stopword_hits`` passes (lists are
    disjoint, asserted above; parity property-tested), at a quarter of
    the array traversals — this predicate is what corpus-prep pushes
    into the scan, so its per-row cost is the scan stage's cost.
    Oracle: the same four ``list_filter`` counts as ``stopword_hits``."""
    ws = words(text)

    def tok_bits(w: Column) -> Column:
        chain = F.when(w.isin(*STOPWORDS["en"]), F.lit(1 << _PACK_SHIFT["en"]))
        for lang in ("de", "es", "fr"):
            chain = chain.when(
                w.isin(*STOPWORDS[lang]), F.lit(1 << _PACK_SHIFT[lang])
            )
        return chain.otherwise(F.lit(0)).cast("long")

    packed = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + tok_bits(w)
    )
    mask = F.lit((1 << 16) - 1)
    return {
        lang: F.shiftright(packed, shift).bitwiseAND(mask)
        for lang, shift in _PACK_SHIFT.items()
    }


def lang_pred(text: Column | str) -> Column:
    """Heuristic language-ID: argmax of stopword hits with a fixed
    priority order (en > de > es > fr > und). Deterministic CASE chain;
    the oracle SQL is the literal same chain (over per-language
    ``list_filter`` counts — the packed counter is count-identical). A
    real pipeline would swap in a char-n-gram model via pandas_udf; the
    operator shape (per-row classify, no shuffle) is what matters at
    scale."""
    hits = stopword_hits_all(text)
    en, de, es, fr = hits["en"], hits["de"], hits["es"], hits["fr"]
    return (
        F.when((en >= de) & (en >= es) & (en >= fr) & (en > 0), "en")
        .when((de >= es) & (de >= fr) & (de > 0), "de")
        .when((es >= fr) & (es > 0), "es")
        .when(fr > 0, "fr")
        .otherwise("und")
    )


def quality_score(text: Column | str) -> dict[str, Column]:
    """Length/stopword/word-shape quality heuristics.

    Returns named components plus a combined score; all ratios are
    int/int double divisions evaluated with the identical expression in
    the oracle SQL, so hashes match exactly.
    """
    c = F.col(text) if isinstance(text, str) else text
    norm = normalize(c)
    n_tokens = ws_token_count(c)
    n_alpha_chars = F.length(F.regexp_replace(norm, " ", ""))
    avg_token_len = n_alpha_chars.cast("double") / n_tokens
    # packed counter: shares one token-array traversal with lang_pred
    # when both appear in a projection (identical subtree -> codegen
    # subexpression elimination evaluates it once)
    stop_ratio = stopword_hits_all(c)["en"].cast("double") / n_tokens
    raw = (
        F.least(n_tokens.cast("double") / 200.0, F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + F.least(avg_token_len / 8.0, F.lit(1.0)) * 0.3
    )
    # explicit floor(x*1e6 + 0.5)/1e6 instead of ROUND(x, 6): engines
    # disagree on ROUND half-ties (Spark rounds the shortest decimal
    # repr, DuckDB the binary value — 3 of 5000 sf0.1 docs diverged);
    # the floor form is the same IEEE ops in both, so it cannot drift
    score = F.floor(raw * 1_000_000 + F.lit(0.5)) / 1_000_000
    return {
        "n_tokens": n_tokens,
        "avg_token_len": avg_token_len,
        "stop_ratio": stop_ratio,
        "quality_score": score,
    }


def fingerprint_md5(text: Column | str) -> Column:
    """Whole-document fingerprint: md5 of the normalized text.
    Oracle: ``md5(<norm>)``."""
    return F.md5(normalize(text))


def fingerprint_min_shingle(text: Column | str, n: int = 3) -> Column:
    """Winnowing-flavored rolling fingerprint: the minimum md5 over the
    document's word n-gram shingles (a 1-hash MinHash). Oracle:
    ``list_min(list_transform(<shingles>, s -> md5(s)))``."""
    return F.array_min(F.transform(shingles(text, n), F.md5))


# Cleaning regexes shared verbatim by the Spark expression and the
# DuckDB oracle (syntax subset valid in both Java regex and RE2).
URL_RE = "https?://[^\\s]+"
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PUNCT_RUN_RE = "[!?.,;:]{3,}"
# NANP-ish phone shapes: 555-123-4567 / 555.123.4567 / (555) 123-4567.
# Deliberately narrow (no bare 10-digit runs — those collide with ids)
# and RE2-compatible (no lookaround).
PHONE_RE = "\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-.][0-9]{4}"

# PII classes scanned/redacted by pii_* below, in application order
# (URLs first: an e-mail-shaped substring inside a URL should count
# as URL, not e-mail).
PII_CLASSES = (("url", URL_RE), ("email", EMAIL_RE), ("phone", PHONE_RE))


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-class PII match counts. Each class counts matches in the
    text with the PRIOR classes already redacted, so overlapping
    shapes are attributed to exactly one class.
    Oracle: ``len(regexp_extract_all(<prior-redacted>, RE))``."""
    c = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    for name, pat in PII_CLASSES:
        out[f"n_{name}s"] = F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        c = F.regexp_replace(c, pat, f"<{name}>")
    return out


def pii_redact(text: Column | str) -> Column:
    """Text with every PII class replaced by its ``<class>`` tag —
    the redaction pass a corpus runs before anything persists.
    Oracle: the same nested ``regexp_replace(..., 'g')`` chain."""
    c = F.col(text) if isinstance(text, str) else text
    for name, pat in PII_CLASSES:
        c = F.regexp_replace(c, pat, f"<{name}>")
    return c


def clean_text(text: Column | str) -> Column:
    """Boilerplate stripping for training data: URLs and e-mail
    addresses replaced by a space, shouting punctuation runs collapsed
    to one character, whitespace re-normalized. Pure JVM regex chain —
    one projection, no shuffle, and at 100 TB this runs inside the scan
    stage."""
    c = F.col(text) if isinstance(text, str) else text
    no_url = F.regexp_replace(c, URL_RE, " ")
    no_mail = F.regexp_replace(no_url, EMAIL_RE, " ")
    collapsed = F.regexp_replace(no_mail, PUNCT_RUN_RE, ".")
    return F.trim(F.regexp_replace(collapsed, r"\s+", " "))
