"""Text-analysis Column builders (north-star text ops, SURVEY.md §2B).

Everything here is built from Spark SQL built-ins (split/transform/
aggregate/regexp) so it runs inside whole-stage codegen — the same
expressions scale to a 100 TB documents table with no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker words per language for the n-gram/stopword lang-id heuristic.
# Tiny on purpose: the mechanism (score per language -> argmax) is the
# operator; swap in real stopword lists for production corpora.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "fast"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def norm_text(c: Column | str) -> Column:
    """Normalization used by exact dedup: lowercase, trim, collapse
    whitespace runs."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization (array<string>)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.split(c, " ")


def bpe_ish_tokens(c: Column | str) -> Column:
    """BPE-ish sub-word split: alternating alpha / digit / punct runs.
    A cheap proxy for tokenizer-based token counting."""
    c = F.col(c) if isinstance(c, str) else c
    spaced = F.regexp_replace(c, r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])", r"$1 ")
    return F.filter(F.split(F.trim(spaced), r"\s+"), lambda t: t != "")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c)).cast("long")


def word_ngrams(c: Column | str, n: int) -> Column:
    """Word n-grams joined by a single space (array<string>). Empty
    array when the document has fewer than n tokens."""
    toks = tokens(c)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    # guard: Spark's sequence(1, 0) is a DESCENDING [1, 0], not empty
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def stopword_ratio(c: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = tokens(c)
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw.cast("double") / F.size(toks).cast("double")


def punct_ratio(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct.cast("double") / F.length(c).cast("double")


def uniq_token_ratio(c: Column | str) -> Column:
    toks = tokens(c)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")


def mean_token_len(c: Column | str) -> Column:
    toks = tokens(c)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return total.cast("double") / F.size(toks).cast("double")


def quality_score(c: Column | str) -> Column:
    """Deterministic doc-quality heuristic in [0, ~1]: rewards unique
    vocabulary and moderate length, penalizes punctuation noise.
    Integer-derived doubles only -> engine-portable."""
    toks = tokens(c)
    n = F.size(toks).cast("double")
    length_term = F.least(n / F.lit(64.0), F.lit(1.0))
    return (
        F.lit(0.5) * uniq_token_ratio(c)
        + F.lit(0.3) * length_term
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio(c))
    )


def lang_scores(c: Column | str) -> dict[str, Column]:
    """Marker-hit count per language (the lang-id signal)."""
    toks = tokens(c)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        m = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(m, t))).cast(
            "long"
        )
    return out


def lang_guess(c: Column | str) -> Column:
    """argmax over marker counts; 'und' (undetermined) when all zero.
    Ties broken by language-code order (deterministic)."""
    scores = lang_scores(c)
    langs = sorted(scores)
    best = None
    best_score = None
    for lang in langs:
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def rolling_hash(c: Column | str, mod: int = (1 << 31) - 1, base: int = 131) -> Column:
    """Polynomial rolling hash over the document's tokens:
    h = fold(h * base + tokval) mod m, with m = 2^31-1 so the int64
    intermediate (acc*131 + v < 2^39) never overflows. The per-token
    value is the first 8 md5 hex digits as an integer (mod m) — md5 is
    bit-identical across engines, so the whole fingerprint is exactly
    reproducible in portable SQL (unlike xxhash64, which is
    Spark-specific). Computed entirely in codegen."""
    toks = tokens(c)
    tok_val = lambda t: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"), F.lit(mod)
    )
    return F.aggregate(
        F.transform(toks, tok_val),
        F.lit(0).cast("long"),
        lambda acc, v: F.pmod(acc * base + v, F.lit(mod)),
    )


def winnow_fingerprints(
    c: Column | str, k: int = 3, w: int = 4, mod: int = (1 << 31) - 1
) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): hash every word k-gram, slide a window of ``w``
    consecutive k-gram hashes, keep the minimum of each window; the
    sorted distinct selected hashes are the fingerprint set
    (array<long>). Guarantee: two documents sharing a run of at least
    ``w + k - 1`` tokens share at least one fingerprint, while only
    ~2/(w+1) of the k-grams are retained — the density/recall dial for
    plagiarism-style local near-dup detection that whole-document
    MinHash misses.

    Entirely array HOFs in codegen: no explode, no shuffle, no Python.
    Per-gram hash is md5-derived (first 8 hex digits mod ``mod``), so
    the whole set is bit-identical in portable SQL, like
    ``rolling_hash``. Documents with fewer than ``w`` k-grams yield
    one fingerprint (the global min); empty ones yield an empty array.
    """
    gh_expr = F.transform(
        word_ngrams(c, k),
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"), F.lit(mod)
        ),
    )

    # Bind the hash array ONCE via a one-element transform: a lambda
    # body that referenced gh_expr directly would re-evaluate every
    # md5 for EVERY window (Catalyst HOFs don't CSE across lambda
    # boundaries) — measured 70x slower on 5k docs.
    def _winnow(gh: Column) -> Column:
        n = F.size(gh)
        mins = F.transform(
            F.sequence(F.lit(1), n - (w - 1)),
            lambda i: F.array_min(F.slice(gh, i, w)),
        )
        return (
            F.when(n <= 0, F.array().cast("array<long>"))
            .when(n < w, F.array(F.array_min(gh)))
            .otherwise(F.array_sort(F.array_distinct(mins)))
        )

    return F.transform(F.array(gh_expr), _winnow)[0]


def content_md5(c: Column | str) -> Column:
    """Portable content hash of the normalized text (oracle-friendly:
    md5 is identical in Spark and DuckDB)."""
    return F.md5(norm_text(c))


def content_sha256(c: Column | str) -> Column:
    return F.sha2(norm_text(c), 256)


def token_chunks(c: Column | str, size: int, stride: int | None = None) -> Column:
    """Overlapping fixed-size token windows (array<string> of chunk
    texts) — the standard LLM training-data chunking step. ``stride``
    defaults to ``size`` (no overlap). The final partial window is
    kept iff the doc is non-empty and not covered by a full window."""
    stride = stride or size
    toks = tokens(c)
    n = F.size(toks)
    # a window starts every `stride` tokens while start <= n, so every
    # token is covered; trailing windows may be shorter than `size`
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(toks, s, size), " ")
    )
    return F.when(n > 0, chunks).otherwise(F.array().cast("array<string>"))
