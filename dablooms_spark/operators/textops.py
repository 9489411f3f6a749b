"""Text-analysis operators for web-corpus pipelines.

Everything here is pure Catalyst expressions (JVM-side, whole-stage
codegen, no Python workers): token counting, quality scoring, n-gram
language ID, and k-gram document fingerprinting. Deterministic, so
each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small marker-token sets per language (n-gram heuristic language ID)
LANG_MARKERS = {
    "en": ("the", "of", "and", "a", "to"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "y", "las", "una"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(text_col: str | Column) -> Column:
    """Whitespace tokenization (single-space split — the corpus stores
    single-space-joined tokens; byte-identical to the oracle's
    string_split)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def with_token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens(text_col)))


# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space
# symbols — the shape GPT-style byte-pair pre-tokenizers split on.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def with_bpe_token_count(
    df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens"
) -> DataFrame:
    """Token count under a BPE-style pre-tokenization regex (letters
    runs / digit runs / single symbols) — pure Catalyst regexp_count,
    the cheap proxy for LLM-token budgeting over a corpus."""
    return df.withColumn(
        out, F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))
    )


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, t)))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features + composite score:
    token count, mean token length, stopword ratio, and a [0,1] score
    that rewards mid-length documents with natural stopword density.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    mean_tok_len = (n_chars - (n_tok - F.lit(1))) / n_tok  # chars minus separators
    stop_ratio = _count_in(toks, STOPWORDS) / n_tok
    length_term = F.least(n_tok / F.lit(200.0), F.lit(1.0))
    stop_term = F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
    # no rounding: identical integer-division expressions produce
    # bit-identical IEEE doubles in Spark and DuckDB, so the oracle
    # compare is exact; rounding would only introduce divergence
    score = length_term * F.lit(0.5) + stop_term * F.lit(0.5)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", score)
    )


def with_lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Marker-token language ID. Ties and all-zero scores resolve by
    the fixed order en > de > fr > es > unknown, so the rule is fully
    deterministic and SQL-expressible."""
    toks = tokens(text_col)
    scores = {lang: _count_in(toks, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.lit("unknown")
    best_score = F.lit(0)
    # reverse priority order so earlier languages win ties via >
    for lang in ("es", "fr", "de", "en"):
        s = scores[lang]
        take = s >= F.greatest(best_score, F.lit(1))
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, s)
    return df.withColumn(out, best)


def with_fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 5, out: str = "fingerprint"
) -> DataFrame:
    """k-gram document fingerprint: the minimum md5 over the document's
    token k-gram shingles (a 1-permutation MinHash). md5 is available
    in both Spark and DuckDB, so the fingerprint is oracle-exact.
    Near-identical documents collide with probability ≈ Jaccard."""
    toks = tokens(text_col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return df.withColumn(out, F.array_min(F.transform(grams, F.md5)))


def with_repetition_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, pure Catalyst.

    Adds, per document:
      n_tokens          — whitespace token count
      dup_token_frac    — fraction of tokens that are repeats of an
                          earlier token (1 - distinct/total); high
                          values flag boilerplate/keyword-stuffed docs
      top_bigram_count  — occurrences of the most frequent word bigram
      top_bigram_frac   — that count over all bigrams; the classic
                          "repeated phrase" filter from the Gopher /
                          MassiveText quality rules

    The most-frequent-bigram count is computed WITHOUT explode/shuffle:
    sort the per-row bigram array and take the longest equal-run via a
    single F.aggregate fold — O(n log n) per document, stays inside
    whole-stage codegen, no Python, no per-doc groupBy. At 100 TB this
    is a map-only stage over the scan.

    Documents with fewer than 2 tokens get top_bigram_count = 0 and
    top_bigram_frac = 0.0 (no bigrams exist).
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    dup_token_frac = (
        (n_tok - F.size(F.array_distinct(toks))).cast("double") / n_tok
    )
    n_bg = n_tok - F.lit(1)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_bg, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    sorted_bg = F.array_sort(bigrams)
    # longest equal-run in the sorted array == max bigram multiplicity
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + F.lit(1)).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_cnt = F.when(
        n_tok >= 2, F.aggregate(sorted_bg, zero, _step, lambda a: a["best"])
    ).otherwise(F.lit(0))
    top_frac = F.when(
        n_tok >= 2, top_cnt.cast("double") / n_bg
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("dup_token_frac", dup_token_frac)
        .withColumn("top_bigram_count", top_cnt)
        .withColumn("top_bigram_frac", top_frac)
    )


def shingle_strings(text_col: str | Column, k: int = 5) -> Column:
    """Distinct token k-gram shingle STRINGS (JVM-side). The exact
    twin of shingle_hashes — use when collision-free equality matters
    (e.g. decontamination audits) at the cost of moving strings
    instead of longs."""
    toks = tokens(text_col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(grams)


def shingle_hashes(
    text_col: str | Column, k: int = 5, num_buckets: int = 1 << 32
) -> Column:
    """Distinct xxhash64 values of token k-gram shingles (JVM-side).
    The MinHash/LSH dedup path consumes these; xxhash64 keeps the
    whole shingling stage inside whole-stage codegen."""
    grams = shingle_strings(text_col, k)
    return F.array_distinct(
        F.transform(grams, lambda g: F.pmod(F.xxhash64(g), F.lit(num_buckets)))
    )


def with_normalized_text(
    df: DataFrame, text_col: str = "text", out: str = "text_norm"
) -> DataFrame:
    """Canonical text normalization — the pass that runs before any
    hashing/dedup stage so byte-trivial variants (stray control
    chars, runs of whitespace, case) collapse to one fingerprint:
    strip C0/C1 control characters, collapse whitespace runs to one
    space, trim, lowercase. Chained whole-stage-codegen Catalyst
    expressions (map-only, no UDF), each step in the Java-regex ∩ RE2
    shared subset so an external engine reproduces the exact bytes.
    Deliberately NOT unicode-normalizing (no NFC/NFKC): that is
    locale/library-versioned and would break the byte-identity
    invariant the hash kernels rely on; run it upstream if required
    and re-verify."""
    c: Column = F.col(text_col)
    stripped = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    squeezed = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return df.withColumn(out, F.lower(squeezed))


#: redaction patterns, applied in ORDER: emails first (self-contained
#: token), then IPv4 (so the phone pattern below can never eat a
#: dotted quad), then phone-shaped digit runs. Deliberately restricted
#: to constructs shared by Java regex and RE2 (\b, \d, classes —
#: no lookarounds) so a DuckDB/RE2 oracle reproduces the exact bytes.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d{7,15}\b", "<PHONE>"),
    (r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
)


def with_pii_redacted(
    df: DataFrame, text_col: str = "text", out: str = "text_redacted"
) -> DataFrame:
    """Replace email addresses, IPv4 addresses, and phone-shaped
    digit runs with typed placeholder tokens — the standard scrub
    pass before a web corpus is trained on. Chained
    `regexp_replace` Catalyst expressions: map-only, whole-stage
    codegen, no UDF. The pattern set is intentionally conservative
    (high precision); swap in jurisdiction-specific patterns via
    `PII_PATTERNS`-shaped pairs for a production pass."""
    c: Column = F.col(text_col)
    for pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return df.withColumn(out, c)


def with_extracted_text(
    df: DataFrame, html_col: str = "html", out: str = "text"
) -> DataFrame:
    """Deterministic text extraction from an html binary column —
    whole-stage-codegen Catalyst expressions only (UTF-8 decode, tag
    strip, entity unescape, whitespace squeeze), so the extracted
    bytes per url are identical on every run, every partition, every
    cluster size: the input_hint's byte-identical-text invariant holds
    by construction, with no extractor-library version variance.
    Feed the output straight to the hash kernels (which hash `text`
    exactly as stored — no further normalization)."""
    decoded = F.decode(F.col(html_col), "UTF-8")
    no_tags = F.regexp_replace(decoded, r"<[^>]*>", " ")
    # unescape &amp; LAST (standard HTML unescape order): doing it
    # first would double-unescape &amp;lt; into '<' instead of '&lt;'
    unescaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(no_tags, "&lt;", "<"), "&gt;", ">"
        ),
        "&amp;",
        "&",
    )
    squeezed = F.trim(F.regexp_replace(unescaped, r"\s+", " "))
    return df.withColumn(out, squeezed)
