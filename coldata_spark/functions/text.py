"""Text operators (SURVEY.md §2.8 T1-T13 + text-analysis extensions).

Everything here is a Column expression built from pyspark.sql.functions —
JVM-side, whole-stage-codegen'd, no Python in the hot path.  The reference
implements these as row-at-a-time Python (crawler/utils.py:5-36 clean/join,
vdb.py:41-43 chunking via langchain, uci.py:51 sha256 pk); at 100 TB the
expression form is the only viable one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default chunking geometry — mirrors the reference's
# RecursiveCharacterTextSplitter(chunk_size=128, chunk_overlap=64)
# (/root/reference/src/config.yml:88-91, vdb.py:41-43).  Stride = size -
# overlap.  We use fixed-stride windows (deterministic, oracle-checkable)
# rather than the reference's separator-aware recursive splits.
CHUNK_SIZE = 128
CHUNK_OVERLAP = 64
CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP


def clean_text(col: Column) -> Column:
    """T1 (crawler/utils.py:5-18): drop non-printables, normalize
    CR/LF/tabs to spaces, collapse runs of whitespace, trim."""
    c = F.regexp_replace(col, r"[^\x20-\x7E]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def sha_pk(col: Column) -> Column:
    """T6 (uci.py:51): sha256 hexdigest primary key of a URL/string."""
    return F.sha2(col, 256)


def preview(col: Column, n: int = 200) -> Column:
    """T7/T8 (main.py:52-53): first-n-chars preview with ellipsis,
    newlines flattened."""
    flat = F.regexp_replace(F.regexp_replace(col, r"\n", " "), r"###", "")
    return F.concat(F.substring(flat, 1, n), F.lit("..."))


def n_chunks(length: Column, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> Column:
    """Number of fixed-stride chunks covering a string of ``length`` chars:
    1 + ceil(max(0, length - size) / stride)."""
    extra = F.greatest(F.lit(0.0), (length - F.lit(size)).cast("double"))
    return (F.lit(1) + F.ceil(extra / F.lit(stride))).cast("int")


def chunk_starts(length: Column, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> Column:
    """array<int> of 0-based chunk positions [0, 1, ..., n_chunks-1].

    posexplode() of this array + substring() re-expresses the reference's
    per-document chunk loop (vdb.py:68-74) as a UDTF-style 1->N expansion;
    chunk ids are concat(index, '_', pos) exactly like vdb.py:70.
    """
    return F.sequence(F.lit(0), n_chunks(length, size, stride) - 1)


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def word_chars(col: Column) -> Column:
    """Count of word characters [A-Za-z0-9_]."""
    return F.length(col) - F.length(F.regexp_replace(col, r"\w", ""))


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII letters (quality signal)."""
    letters = F.length(col) - F.length(F.regexp_replace(col, r"[A-Za-z]", ""))
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        letters.cast("double") / F.length(col).cast("double")
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the canonicalized text (lowercase,
    punctuation stripped, whitespace collapsed, trimmed).  Two documents with
    the same fingerprint are exact near-dups modulo case/punct/spacing.

    ONE regex pass, not two: ``[^a-z0-9]+ -> " "`` is exactly equivalent
    to per-char substitution followed by space-run collapsing (any run of
    non-alphanumerics, spaces included, becomes one space either way),
    and the canonicalization IS the cost of the fingerprint rung — the
    round-12 64x sweep measured the two-pass form at 10 s/320k docs
    with DuckDB ~30x faster per byte (SCALE.md), so halving the regex
    work is the cheap exact-preserving cut.  The oracle twins keep
    whichever form they had: the canonical string is provably identical,
    so the md5 hash-check is unaffected."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.md5(F.trim(c))


# Marker vocabularies for the deterministic n-gram language-ID heuristic.
# Counting marker-token hits per language and taking the argmax is the
# classic fastText-style baseline reduced to an oracle-checkable expression.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
}


def _marker_hits(col: Column, markers: tuple[str, ...]) -> Column:
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    total = F.lit(0)
    for m in markers:
        total = total + F.size(F.split(padded, f" {m} ")) - 1
    return total


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (see LANG_MARKERS)."""
    return {lang: _marker_hits(col, ms) for lang, ms in LANG_MARKERS.items()}


def quality_score_raw(col: Column) -> Column:
    """Unrounded composite quality score in [0,1]: length saturation +
    alpha ratio.  score = 0.5 * min(1, tokens/64) + 0.5 * alpha_ratio.
    Deterministic, expression-only — the shape of C4/Gopher-style quality
    filters.  Use this form for FILTERING (both engines compute the
    identical double); use quality_score for display/hash outputs."""
    sat = F.least(F.lit(1.0), token_count(col).cast("double") / F.lit(64.0))
    return F.lit(0.5) * sat + F.lit(0.5) * alpha_ratio(col)


def quality_score(col: Column) -> Column:
    """quality_score_raw rounded to 6 decimals for oracle-hashed outputs."""
    return F.round(quality_score_raw(col), 6)


def eight_gram_md5s(df, text_col: str):
    """Explode ``text_col`` into md5'd whitespace-token 8-grams (one row
    per gram in column ``g``, other columns carried through) — the gram
    unit of benchmark decontamination (q95/q163/q169).  Short docs are
    guarded explicitly: ``sequence(1, 0)`` is DESCENDING ``[1, 0]``
    (default step -1) and ``slice(w, 0, 8)`` then raises
    INVALID_PARAMETER_VALUE.START — a single <=7-token doc would abort the
    whole job.  ``array_repeat(1, 0)`` is a typed empty ``array<int>``, so
    short docs contribute zero grams (matching DuckDB's
    ``generate_series``, which is empty when stop < start)."""
    return df.select(
        *[c for c in df.columns if c != text_col],
        F.split(F.trim(text_col), r"\s+").alias("w"),
    ).select(
        *[c for c in df.columns if c != text_col],
        F.explode(
            F.expr(
                "transform(if(size(w) >= 8, sequence(1, size(w) - 7), "
                "array_repeat(1, 0)), "
                "i -> md5(concat_ws(' ', slice(w, i, 8))))"
            )
        ).alias("g"),
    )
