"""Text-analysis primitives for the large-scale pipeline tier (SURVEY §2.4
X4): tokenization, token stats, language-ID heuristic, quality scoring,
document fingerprinting. All pure Column expressions (whole-stage codegen,
no Python in the hot path) so they survive a 100 TB scan untouched.

Each helper has a deliberately parallel DuckDB SQL formulation in
queries/pipeline.py so the oracle compares bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small public stopword sets (frequency lists are public knowledge); the
# language-ID heuristic scores stopword hits per language
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "auf"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "los", "y", "de", "un", "una", "para", "en", "es"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "pour", "dans", "est"],
}

FINGERPRINT_MOD = 2_147_483_647  # 2^31 - 1: rolling-hash state fits int64


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex splitter is
    ``regex_tokens``)."""
    return F.split(_c(col), " ")


def regex_tokens(col: str | Column) -> Column:
    """BPE-ish pre-tokenizer: letter runs / digit runs / single symbols."""
    return F.regexp_extract_all(_c(col), F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), 0)


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def stopword_hits(col_tokens: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang`` (duplicates count)."""
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(col_tokens, lambda t: F.array_contains(arr, t)))


def lang_scores(col: str | Column) -> dict[str, Column]:
    t = tokens(col)
    return {lang: stopword_hits(t, lang) for lang in STOPWORDS}


def lang_id(col: str | Column) -> Column:
    """Argmax of stopword hits, ties broken by language code order; no
    hits → 'und' (undetermined); CJK-dominant text → 'zh'."""
    c = _c(col)
    scores = lang_scores(c)
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    cjk = F.size(F.regexp_extract_all(c, F.lit("[一-鿿]"), 0))
    return F.when(cjk * 3 > F.length(c), F.lit("zh")).otherwise(pred)


def quality_score(col: str | Column) -> Column:
    """Deterministic [0,1] quality heuristic: length target + stopword
    ratio + mean-token-length target. Double arithmetic in a fixed shape
    so the oracle reproduces it exactly."""
    c = _c(col)
    t = tokens(c)
    n_tok = F.size(t).cast("double")
    sw = stopword_hits(t, "en").cast("double")
    avg_len = F.length(c).cast("double") / n_tok
    return (
        F.lit(0.4) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (sw / n_tok)
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.abs(avg_len - F.lit(5.0)) / F.lit(10.0), F.lit(1.0)))
    )


def doc_fingerprint(col: str | Column) -> Column:
    """Polynomial rolling hash over character codes,
    ``fold(acc = (acc*31 + code) mod (2^31-1))`` — an order-sensitive
    content fingerprint (X4). Left fold via ``aggregate`` matches the
    oracle's ``list_reduce`` term for term."""
    c = _c(col)
    # chars via split, NOT substr-per-index: element i's substr walks the
    # string from 0, so the sequence/substr form is O(len²) per document
    # (the char-level twin of the shingles() materialization trap below —
    # measured 5× on the sf0.1 corpus). split("") yields [""] for the
    # empty string and ascii("") = 0, which folds to the same 0 the empty
    # sequence produced.
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD,
    )


def shingles(col_tokens: Column, n: int = 3) -> Column:
    """n-token shingles (space-joined) — the near-dup similarity unit.
    Token *sets* over a small vocabulary collide constantly; shingle sets
    don't. Documents shorter than ``n`` tokens collapse to one shingle.

    Pass a MATERIALIZED array column (project ``tokens(text)`` into its
    own select first), not the raw ``split`` expression: ``element_at``
    over a non-materialized ``split`` re-evaluates the split per element
    (no CSE inside lambda bodies) and turns the shingle pass quadratic in
    document length."""
    t = col_tokens
    make = lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)])  # noqa: E731
    return F.when(F.size(t) < n, F.array(F.concat_ws(" ", t))).otherwise(
        F.transform(F.sequence(F.lit(0), F.size(t) - n), make)
    )
