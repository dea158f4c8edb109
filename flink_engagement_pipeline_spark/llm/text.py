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


def positional_grams(ws: Column, n: int) -> Column:
    """NON-distinct word n-grams in position order over a token array
    — the anchor stream exact-substring dedup needs (``shingles()``
    dedups and loses positions; repetition and offsets both matter
    there). Same zip-shift build as shingles (no per-index
    element_at re-evaluation); docs shorter than n words yield an
    EMPTY array (no anchors), not a whole-text fallback. Element i
    (0-based after posexplode) covers tokens [i, i+n).
    Oracle: ``list_transform(generate_series(1, len(ws)-(n-1)),
    i -> ws[i]||' '||...)`` (1-based — interval arithmetic uses
    differences only, so the base offset cancels)."""
    # alias each shift positionally: arrays_zip names struct fields
    # after NAMED input columns (shingles() gets 0..n-1 for free only
    # because its inputs are anonymous expressions)
    shifted = [ws.alias("0")] + [
        F.slice(ws, d + 1, F.greatest(F.size(ws) - d, F.lit(0))).alias(str(d))
        for d in range(1, n)
    ]
    z = F.slice(
        F.arrays_zip(*shifted), 1, F.greatest(F.size(ws) - (n - 1), F.lit(0))
    )
    grams = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(d)] for d in range(n)])
    )
    return F.when(F.size(ws) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


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


def repetition_stats(docs) -> "DataFrame":
    """Within-document repetition signals — the token-level form of
    the Gopher repetition filters (Rae et al. 2021 §A1.1: documents
    dominated by a repeated n-gram or by repeated longer spans are
    low-quality and over-weight their content in training). Two
    signals per document:

    - ``top_bigram_n`` / ``top_bigram_frac``: occurrence count of the
      document's most frequent word bigram and the token fraction its
      occurrences span (count*2/n_tokens — occurrences may overlap,
      so the raw ratio is reported uncapped, as in the paper's
      char-fraction form).
    - ``rep5_tokens`` / ``rep5_frac``: tokens covered by the UNION of
      all word 5-grams occurring >= 2 times within the document
      (llm/dedup.py:merged_dup_intervals — no double counting), and
      the covered fraction. This is substring_dup_coverage's anchor
      device scoped to PARTITION BY (doc, gram) instead of corpus-
      wide gram counts.

    Plan: three column-pruned scans of (doc_id, text) — one per
    branch (token count / bigrams / 5-gram anchors); re-reading two
    pruned columns beats the alternative single-scan shape (explode
    the token stream once, derive n-grams via lead() windows), which
    would shuffle EVERY token through one doc_id sort. The bigram
    top-count is two hash aggregations ((doc,gram) then doc —
    map-side partial on both), the 5-gram coverage is the
    count-over-window + gaps-and-islands chain riding (doc_id, g)
    then doc_id exchanges. Every ratio is a single final double
    division of exact longs, so the DuckDB oracle hashes
    bit-identically."""
    from pyspark.sql import Window

    base = docs.select("doc_id", words("text").alias("ws"))
    toks = base.select(
        "doc_id", F.size("ws").cast("long").alias("n_tokens")
    )
    big = base.select(
        "doc_id", F.explode(positional_grams(F.col("ws"), 2)).alias("g")
    )
    top2 = (
        big.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("top_bigram_n"))
    )
    anch = base.select(
        "doc_id",
        F.posexplode(positional_grams(F.col("ws"), 5)).alias("pos", "gram"),
    ).select("doc_id", "pos", F.xxhash64("gram").alias("g"))
    shared = (
        anch.withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id", "g"))
        )
        .filter(F.col("n") >= 2)
        .select("doc_id", "pos")
    )
    from .dedup import merged_dup_intervals

    rep5 = (
        merged_dup_intervals(shared, 5)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("e0") - F.col("s0")).cast("long").alias("rep5_tokens")
        )
    )
    zero = F.lit(0).cast("long")
    return (
        toks.join(top2, "doc_id", "left")
        .join(rep5, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("top_bigram_n", zero).alias("top_bigram_n"),
            (
                (F.coalesce("top_bigram_n", zero) * F.lit(2)).cast("double")
                / F.col("n_tokens")
            ).alias("top_bigram_frac"),
            F.coalesce("rep5_tokens", zero).alias("rep5_tokens"),
            (
                F.coalesce("rep5_tokens", zero).cast("double")
                / F.col("n_tokens")
            ).alias("rep5_frac"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge training
# ---------------------------------------------------------------------------

BPE_MERGES = 6


def bpe_merges(docs, k: int = BPE_MERGES):
    """Byte-pair-encoding merge training (Sennrich et al. 2016) over
    the corpus: the k highest-weighted adjacent symbol pairs, merged
    greedily in order — the tokenizer-training op every LLM data
    pipeline runs before docs_tokenize_ids-style id mapping.

    Shape: the DISTRIBUTED work is the word-frequency table (one
    groupBy over the exploded corpus — at 100 TB this is the only
    pass that touches raw text) and, per merge step, a pair-count
    aggregation over the vocabulary table. The vocabulary itself is
    metadata-sized (type count, not token count), so each step's
    argmax collects ONE row — the centroid-collect pattern the
    trainer modules use. Merge application is boundary-guarded
    `replace` on space-joined symbol sequences (pattern ' a b ' ->
    ' ab '): non-overlapping left-to-right with IDENTICAL semantics
    in both engines, so pair counting (per adjacent position,
    overlaps counted) and application are deterministic and the
    whole training run carries an exact unrolled-SQL DuckDB oracle
    (k chained MATERIALIZED stages — see the MMR oracle for why
    recursion is avoided).

    Semantics note: because the consumed pattern includes the
    trailing boundary space, a self-pair merging into a run of >= 4
    identical symbols skips one extra token vs the textbook
    left-to-right scan ('a a a a' -> 'aa a a' here, 'aa aa' in the
    textbook scan). Deterministic, cross-engine identical, and
    mirrored by the pytest reference; no fixture word exhibits such
    runs today, but the contract is the replace semantics, not the
    textbook scan. Returns (merge_rank, left_sym, right_sym, merged,
    pair_count).
    """
    spark = docs.sparkSession
    merges, _ = _bpe_train(docs, k)
    # literal JVM-side result frame (a Python createDataFrame would
    # spin up a Python-RDD job for 6 rows); F.lit keeps the symbols
    # out of SQL text here too
    rows = [
        F.struct(
            F.lit(r).alias("merge_rank"),
            F.lit(a).alias("left_sym"),
            F.lit(b).alias("right_sym"),
            F.lit(m).alias("merged"),
            F.lit(pc).cast("bigint").alias("pair_count"),
        )
        for r, a, b, m, pc in merges
    ]
    return spark.range(1).select(F.inline(F.array(*rows)))


def _bpe_train(docs, k: int):
    """Shared BPE training loop: returns (merge list, final word
    vocabulary DataFrame). The merge list is metadata-sized (k rows,
    collected one argmax row per step — the centroid-collect
    pattern); the returned ``seqs`` frame maps each distinct word to
    its space-joined post-merge symbol sequence, which is exactly the
    encode table :func:`bpe_encode` needs (BPE is word-local, so
    encoding joins the corpus against this TYPE-count-sized table
    instead of re-running merges over every token).

    Memoized per semantic input (the deterministic-trainer device
    from llm/pq.py): training runs k argmax jobs, so when
    docs_bpe_merges and docs_bpe_encode share one process — the
    driver gate, bench — the second call pays only the replace-chain
    replay (pure projections, zero jobs)."""
    from .pq import _codebook_memo, _memo_freeze, _memo_key, _memo_put, _memo_thaw

    words = docs.selectExpr("explode(split(text, ' ')) as word").filter(
        F.col("word") != ""
    )
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    seqs = wc.selectExpr(
        "word", "cnt", "trim(regexp_replace(word, '(.)', '$1 ')) as seq"
    )
    memo_key = ("bpe", k, _memo_key(docs))
    if memo_key in _codebook_memo:
        merges = [tuple(m) for m in _memo_thaw(_codebook_memo[memo_key])]
        for _step, a, b, _m, _pc in merges:
            seqs = seqs.select(
                "word",
                "cnt",
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                        F.lit(f" {a} {b} "),
                        F.lit(f" {a}{b} "),
                    )
                ).alias("seq"),
            )
        return merges, seqs
    seqs = seqs.localCheckpoint()
    merges = []
    for step in range(1, k + 1):
        pairs = (
            seqs.selectExpr("cnt", "split(seq, ' ') as sp")
            # a fully-merged word has no pairs; also guards Spark's
            # sequence(1, 0), which DESCENDS instead of being empty
            .filter("size(sp) >= 2")
            .selectExpr(
                "cnt",
                "explode(transform(sequence(1, size(sp) - 1), i -> "
                "named_struct('a', element_at(sp, i), "
                "'b', element_at(sp, i + 1)))) as p",
            )
            .select("cnt", "p.a", "p.b")
        )
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("cnt").alias("pc"))
            .orderBy(F.col("pc").desc(), "a", "b")
            .limit(1)
            .collect()[0]
        )
        a, b, pc = best["a"], best["b"], int(best["pc"])
        merges.append((step, a, b, a + b, pc))
        # corpus-derived symbols go through F.lit (py4j literal
        # parameters, escaped by construction) — NEVER spliced into
        # SQL text, where a quote/backslash in a fixture word would
        # be a syntax error
        seqs = seqs.select(
            "word",
            "cnt",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                    F.lit(f" {a} {b} "),
                    F.lit(f" {a}{b} "),
                )
            ).alias("seq"),
        ).localCheckpoint()
    _memo_put(memo_key, _memo_freeze(merges))
    return merges, seqs


def bpe_encode(docs, k: int = BPE_MERGES):
    """Apply the trained BPE merges to the corpus — the encode half of
    the tokenizer loop (:func:`bpe_merges` trains; this maps every
    document to its BPE token-id sequence, the op that feeds
    docs_pack_sequences-style batching in a real pre-training
    pipeline).

    Token-id scheme (GPT-2-like, deterministic): the base vocabulary
    is the corpus's distinct characters ordered lexicographically
    (ids 0..C-1), then each merged symbol takes id C + merge_rank - 1.
    Both halves are metadata-sized, collected driver-side like the
    merge list, and shipped back as ONE literal inline-array frame
    (every symbol through F.lit — never spliced into SQL text).

    Shape for 100 TB: BPE encoding is word-local, so the corpus is
    never re-scanned per merge step — the trained word->seq table
    (TYPE count, not token count) is joined to the posexploded corpus
    once (AQE broadcasts it at test scale; at web scale it's one
    shuffle join on `word`, still corpus + types, never corpus x k),
    then symbols join the broadcast vocab for ids and fold back to
    one row per document via sort_array(collect_list(struct)) — an
    order-exact array build with no window over the token stream.
    The id sequence is emitted space-joined (token_ids STRING) so the
    driver's hash canonicalization is engine-portable. Returns
    (doc_id, n_tokens, token_ids).
    """
    spark = docs.sparkSession
    merges, seqs = _bpe_train(docs, k)
    chars = sorted(
        r["c"]
        for r in seqs.selectExpr(
            "explode(split(trim(regexp_replace(word, '(.)', '$1 ')), ' ')) AS c"
        )
        .distinct()
        .collect()
    )
    vocab_rows = [
        F.struct(F.lit(c).alias("sym"), F.lit(i).alias("tok_id"))
        for i, c in enumerate(chars)
    ] + [
        F.struct(
            F.lit(m).alias("sym"), F.lit(len(chars) + r - 1).alias("tok_id")
        )
        for r, _a, _b, m, _pc in merges
    ]
    vocab = spark.range(1).select(F.inline(F.array(*vocab_rows)))
    dwords = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("wi", "word")
        )
        .filter(F.col("word") != "")
    )
    dsyms = (
        dwords.join(seqs.select("word", "seq"), "word")
        .select(
            "doc_id", "wi", F.posexplode(F.split("seq", " ")).alias("si", "sym")
        )
        .join(F.broadcast(vocab), "sym")
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("wi", "si", "tok_id"))
    )
    return (
        dsyms.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(
                F.transform(ordered, lambda s: s["tok_id"].cast("string")),
                " ",
            ).alias("token_ids"),
        )
    )


def _bpe_encode_stages_sql(k: int = BPE_MERGES) -> str:
    """Shared CTE chain for the encode-side oracles: the training
    stages of :func:`bpe_merges_oracle_sql` extended by the vocab
    stage (chars by lexicographic row_number, merges offset by char
    count) and the per-document symbol stream (word-position unnest
    -> word->seq join -> symbol unnest), ending at ``dsyms`` —
    everything except the final aggregation, reused by
    :func:`bpe_encode_oracle_sql` and
    :func:`bpe_bigram_logprob_oracle_sql`."""
    train = bpe_merges_stages_sql(k)
    picks = " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, merged FROM pick{i}" for i in range(1, k + 1)
    )
    return f"""
{train},
vocab_chars AS MATERIALIZED (
  SELECT c AS sym, CAST(row_number() OVER (ORDER BY c) - 1 AS INT) AS tok_id
  FROM (
    SELECT DISTINCT unnest(string_split(
        trim(regexp_replace(word, '(.)', '\\1 ', 'g')), ' ')) AS c
    FROM seqs0
  )
),
vocab AS MATERIALIZED (
  SELECT sym, tok_id FROM vocab_chars
  UNION ALL
  SELECT merged,
         CAST((SELECT count(*) FROM vocab_chars) + merge_rank - 1 AS INT)
  FROM ({picks})
),
dwords AS (
  SELECT d.doc_id, t.i AS wi, d.sp[t.i] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents) d
  CROSS JOIN unnest(generate_series(1, len(d.sp))) AS t(i)
  WHERE d.sp[t.i] <> ''
),
dsyms AS (
  SELECT e.doc_id, e.wi, u.j, e.sp2[u.j] AS sym
  FROM (
    SELECT dw.doc_id, dw.wi, string_split(sq.seq, ' ') AS sp2
    FROM dwords dw JOIN seqs{k} sq ON sq.word = dw.word
  ) e
  CROSS JOIN unnest(generate_series(1, len(e.sp2))) AS u(j)
)"""


def bpe_encode_oracle_sql(k: int = BPE_MERGES) -> str:
    """Exact DuckDB replication of :func:`bpe_encode`: the shared
    encode stages (:func:`_bpe_encode_stages_sql`) closed by the
    ordered per-document string_agg of token ids."""
    return f"""
{_bpe_encode_stages_sql(k)}
SELECT s.doc_id,
       count(*)                                            AS n_tokens,
       string_agg(CAST(v.tok_id AS VARCHAR), ' '
                  ORDER BY s.wi, s.j)                      AS token_ids
FROM dsyms s JOIN vocab v ON v.sym = s.sym
GROUP BY s.doc_id
"""


BPE_LM_ADD_K = 0.5  # add-k smoothing, mirroring the word-level bigram LM


def bpe_bigram_logprob(docs, k: int = BPE_MERGES) -> "DataFrame":
    """Self-trained bigram LM over BPE TOKEN IDS — the tokenizer
    trainer (bpe_merges), the encoder (bpe_encode) and the LM quality
    ladder (docs_bigram_logprob) composed into the loop a real
    pipeline runs: train tokenizer -> encode corpus -> score text by
    token-level perplexity. Subword scoring is what production
    quality filters use (word-level LMs blow their vocabulary on rare
    words and typos; BPE ids make every bigram in-vocabulary by
    construction).

    Same determinism device as the word-level LM: p(t2|t1) =
    (c12 + k)/(c1 + k*V) with each bigram's ln quantized to integer
    nano-nats, so the per-doc sum is order-independent and the whole
    trained-tokenizer-to-perplexity pipeline hash-matches the SQL
    oracle end-to-end. Plan: the encode output's id array feeds ONE
    zip-shift bigram explode (bigrams_list — no window over the token
    stream); model counts ((t1,t2) then t1 hash aggregations, V as a
    broadcast scalar) and the scoring join ride the same exploded
    frame; one final doc aggregation. Docs with < 2 tokens have no
    bigrams and are absent, as in the word-level form. Returns
    (doc_id, n_bigrams, logprob, xent)."""
    enc = bpe_encode(docs, k)
    ids = F.split("token_ids", " ")
    pairs = enc.select(
        "doc_id", F.explode(bigrams_list(ids)).alias("bg")
    ).select(
        "doc_id",
        F.substring_index("bg", " ", 1).alias("t1"),
        F.substring_index("bg", " ", -1).alias("t2"),
    )
    c12 = pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("t1").agg(F.sum("c12").alias("c1"))
    vocab = pairs.agg(F.countDistinct("t2").alias("v"))
    qlp = (
        c12.join(c1, "t1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "t1",
            "t2",
            F.floor(
                F.log(
                    (F.col("c12") + F.lit(BPE_LM_ADD_K))
                    / (F.col("c1") + F.lit(BPE_LM_ADD_K) * F.col("v"))
                )
                * F.lit(1e9)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("q"),
        )
    )
    scored = pairs.join(qlp, ["t1", "t2"]).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("q").alias("sq"),
    )
    logprob = F.col("sq").cast("double") / F.lit(1e9)
    return scored.select(
        "doc_id",
        "n_bigrams",
        logprob.alias("logprob"),
        (-logprob / F.col("n_bigrams")).alias("xent"),
    )


def bpe_bigram_logprob_oracle_sql(k: int = BPE_MERGES) -> str:
    """DuckDB twin of :func:`bpe_bigram_logprob`: the shared encode
    stages, ids ordered per document by (wi, j), adjacent-id bigrams,
    then the word-level LM oracle's count/smoothing/quantize stages
    over token ids."""
    return f"""
{_bpe_encode_stages_sql(k)},
ids AS MATERIALIZED (
  SELECT s.doc_id,
         row_number() OVER (PARTITION BY s.doc_id ORDER BY s.wi, s.j) AS p,
         v.tok_id AS id
  FROM dsyms s JOIN vocab v ON v.sym = s.sym
),
bg AS MATERIALIZED (
  SELECT a.doc_id, a.id AS t1, b.id AS t2
  FROM ids a JOIN ids b ON b.doc_id = a.doc_id AND b.p = a.p + 1
),
c12 AS (SELECT t1, t2, count(*) AS c FROM bg GROUP BY t1, t2),
c1 AS (SELECT t1, CAST(sum(c) AS BIGINT) AS c FROM c12 GROUP BY t1),
vsize AS (SELECT count(DISTINCT t2) AS v FROM bg),
qlp AS (
  SELECT c12.t1 AS t1, c12.t2 AS t2,
         CAST(floor(ln((c12.c + CAST({BPE_LM_ADD_K} AS DOUBLE))
                       / (c1.c + CAST({BPE_LM_ADD_K} AS DOUBLE) * v)) * 1e9
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
  FROM c12 JOIN c1 USING (t1), vsize
)
SELECT b.doc_id                                 AS doc_id,
       count(*)                                 AS n_bigrams,
       CAST(sum(q.q) AS DOUBLE) / 1e9           AS logprob,
       -(CAST(sum(q.q) AS DOUBLE) / 1e9) / count(*) AS xent
FROM bg b JOIN qlp q ON q.t1 = b.t1 AND q.t2 = b.t2
GROUP BY b.doc_id
"""


def bpe_merges_oracle_sql(k: int = BPE_MERGES) -> str:
    """Exact DuckDB replication of :func:`bpe_merges`: the greedy
    merge loop as k unrolled MATERIALIZED stages (pair count ->
    argmax -> replace), each reading the previous stage's vocabulary
    exactly once."""
    unions = " UNION ALL ".join(
        f"SELECT merge_rank, a AS left_sym, b AS right_sym, merged, "
        f"CAST(pc AS BIGINT) AS pair_count FROM pick{i}"
        for i in range(1, k + 1)
    )
    return f"""
{bpe_merges_stages_sql(k)}
SELECT * FROM ({unions}) ORDER BY merge_rank
"""


def bpe_merges_stages_sql(k: int = BPE_MERGES) -> str:
    """The shared WITH clause of the unrolled BPE training oracle
    (word counts -> k chained pair-count/argmax/replace stages),
    reused by both the merge-list oracle and the encode oracle."""
    stages = []
    prev = "seqs0"
    for i in range(1, k + 1):
        stages.append(f"""
pairs{i} AS MATERIALIZED (
  SELECT sum(s.cnt) AS pc, s.sp[t.i] AS a, s.sp[t.i + 1] AS b
  FROM (SELECT cnt, string_split(seq, ' ') AS sp FROM {prev}) s
  CROSS JOIN unnest(generate_series(1, len(s.sp) - 1)) AS t(i)
  GROUP BY 2, 3
),
pick{i} AS MATERIALIZED (
  SELECT {i} AS merge_rank, a, b, a || b AS merged, pc
  FROM pairs{i} ORDER BY pc DESC, a, b LIMIT 1
),
seqs{i} AS MATERIALIZED (
  SELECT word, cnt,
         trim(replace(' ' || seq || ' ',
                      (SELECT ' ' || a || ' ' || b || ' ' FROM pick{i}),
                      (SELECT ' ' || a || b || ' ' FROM pick{i}))) AS seq
  FROM {prev}
)""")
        prev = f"seqs{i}"
    return f"""
WITH
w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
seqs0 AS MATERIALIZED (
  SELECT word, count(*) AS cnt,
         trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
  FROM w WHERE word <> '' GROUP BY word
),{",".join(stages)}"""
