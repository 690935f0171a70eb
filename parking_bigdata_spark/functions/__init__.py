"""Reusable column-expression builders (the `functions/` layer of the
module map): the canonical expressions the operators share, exposed as
a small public API so pipeline authors compose the exact same
semantics the named queries use.

Everything here returns a ``pyspark.sql.Column`` (pure codegen — no
UDFs), so composition stays inside whole-stage codegen and Catalyst
can push/prune through it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "norm_text", "tokenize", "word_ngrams", "money", "money_sum",
    "day_number", "sortable_event_key", "doc_fingerprint",
]

#: tokenizer character class shared by every text operator — one
#: definition so corpus statistics (TF-IDF, PMI, entropy, surprisal)
#: agree on token boundaries
_TOKEN_SEP = "[^a-z0-9 ]"


def norm_text(col: Column | str) -> Column:
    """Whitespace-collapsed, lowercased canonical text — the input to
    exact-dedup fingerprints (B1) and chunking (B28)."""
    return F.lower(F.trim(F.regexp_replace(F.col(col) if isinstance(col, str)
                                           else col, r"\s+", " ")))


def tokenize(col: Column | str) -> Column:
    """Lowercase word tokens as ``array<string>`` (B7-B9 family):
    non-alphanumerics fold to spaces, then split on runs of spaces.
    Materialize this BEFORE ``transform(...)`` lambdas — expressions
    inside higher-order functions re-evaluate per element."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.regexp_replace(F.lower(c), _TOKEN_SEP, " ")),
                   r"\s+")


def word_ngrams(tokens_col: Column | str, n: int) -> Column:
    """Adjacent word n-grams ('a b c') from a token array. The CASE
    guards ``sequence(1, 0)``, which is DESCENDING in Spark and would
    make ANSI ``slice`` throw on short documents."""
    name = tokens_col if isinstance(tokens_col, str) else None
    assert name, "word_ngrams needs a column NAME (used inside expr)"
    return F.expr(
        f"CASE WHEN size({name}) >= {n} THEN "
        f"transform(sequence(1, size({name}) - {n - 1}), "
        f"i -> concat(element_at({name}, i)"
        + "".join(f", ' ', element_at({name}, i + {k})" for k in range(1, n))
        + ")) ELSE CAST(array() AS array<string>) END")


def money(col: Column | str) -> Column:
    """Exact-decimal money value: double→DECIMAL(18,2). Sums and
    threshold comparisons on money must be decimal on BOTH engine and
    oracle side — double accumulation diverges at half-cent ties."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def money_sum(col: Column | str, round_to: int = 4) -> Column:
    """Order-insensitive money total: exact decimal sum, reported as a
    rounded double (engine-portable)."""
    return F.round(F.sum(money(col)).cast("double"), round_to)


def day_number(ts_col: Column | str, epoch: str = "1995-01-01") -> Column:
    """Integer day number from a fixed epoch — value-based window
    frames and gaps-and-islands keys need integer arithmetic that both
    engines evaluate identically (C14, C19)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.datediff(F.to_date(c), F.lit(epoch).cast("date"))


def sortable_event_key(ts_col: Column | str, id_col: Column | str) -> Column:
    """Fixed-width lexicographic (timestamp, id) key: makes min_by /
    max_by deterministic under timestamp ties with ONE sortable string
    (C20) — identical ordering in any engine that compares strings."""
    t = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.concat(F.lpad(F.unix_micros(t).cast("string"), 20, "0"),
                    F.lit("-"), F.lpad(i.cast("string"), 20, "0"))


def doc_fingerprint(text_col: Column | str) -> Column:
    """Canonical-form md5 fingerprint for exact dedup (B1/B10): hash
    keys shuffle uniformly regardless of text skew."""
    return F.md5(norm_text(text_col).cast("binary"))
