"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

These are the LLM-training-data-pipeline additions (SURVEY.md §2 B7-B10).
Everything is built from JVM-side ``pyspark.sql.functions`` (regexp,
split, md5) — no Python UDFs — so the hot path stays in whole-stage
codegen and scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import spread_for_cpu

#: Tiny per-language stopword lexicons for the n-gram/stopword heuristic.
#: Order matters: ties break in this fixed order (deterministic).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "to", "and", "is", "in", "that"],
    "es": ["el", "la", "de", "que", "los", "una", "por"],
    "fr": ["le", "la", "les", "des", "une", "est", "dans"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "zh": ["de", "shi", "bu", "le", "zai", "you"],
}


def _stop_hits(lang: str):
    pat = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    return F.regexp_count(F.lower(F.col("text")), F.lit(pat))


def lang_id(df: DataFrame) -> DataFrame:
    """Heuristic language ID: per-language stopword hit counts, argmax
    with a fixed preference order. A real system would use fastText /
    CLD3; the Spark-side shape (pure map, no shuffle) is identical.
    """
    langs = list(LANG_STOPWORDS)
    out = df
    for lang in langs:
        out = out.withColumn(f"hits_{lang}", _stop_hits(lang))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("unknown")
    for lang in reversed(langs):  # earlier langs win ties
        pred = F.when((F.col(f"hits_{lang}") == best) & (best > 0),
                      F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document quality features: length, word count, average word
    length, punctuation ratio, stopword ratio, and a composite score.
    All regexp/split built-ins — one codegen'd projection.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    n_stop = F.regexp_count(
        F.lower(t), F.lit(r"\b(the|a|of|to|and|is|in|that|it|for)\b"))
    avg_word_len = (n_chars - n_words + 1).cast("double") / n_words
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop.cast("double") / F.greatest(n_words, F.lit(1))
    score = (F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
             + stop_ratio * 0.4
             + (1 - punct_ratio) * 0.2)
    return (df.withColumn("n_chars_txt", n_chars)
              .withColumn("n_words", n_words)
              .withColumn("avg_word_len", F.round(avg_word_len, 4))
              .withColumn("punct_ratio", F.round(punct_ratio, 4))
              .withColumn("stop_ratio", F.round(stop_ratio, 4))
              .withColumn("quality_score", F.round(score, 4)))


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish token count (word pieces and
    isolated punctuation, the classic pre-tokenizer regex)."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = F.regexp_count(t, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))
    return (df.withColumn("ws_tokens", ws)
              .withColumn("bpe_tokens", bpe))


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        k: int = 8, window: int = 4,
                        out_col: str = "winnow_fps") -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al.'s algorithm,
    the classic rolling-hash fingerprint for near-copy detection):
    hash every character k-gram, then keep the minimum hash of each
    sliding window of ``window`` consecutive k-gram hashes.

    Pure SQL expressions: the k-gram hash array is built once
    (materialized column — see word_ngrams note about lambda
    re-evaluation), the winnow pass is a transform over window offsets
    with array_min(slice(...)), then array_distinct. Shared substrings
    of length ≥ k+window-1 are guaranteed to share a fingerprint —
    the downstream join-on-fingerprint finds partial overlaps exact
    dedup misses.
    """
    df = spread_for_cpu(df)
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    tmp = df.withColumn("__norm", norm)
    hashes = (f"transform(sequence(1, greatest(length(__norm) - {k - 1}, 1)), "
              f"i -> xxhash64(substring(__norm, i, {k})))")
    tmp = tmp.withColumn("__kh", F.expr(hashes))
    winnow = (f"array_distinct(transform("
              f"sequence(1, greatest(size(__kh) - {window - 1}, 1)), "
              f"i -> array_min(slice(__kh, i, {window}))))")
    return (tmp.withColumn(out_col, F.expr(winnow))
               .drop("__norm", "__kh"))


#: PII patterns shared by the Spark operator and the DuckDB oracle.
#: Kept to the RE2 ∩ java.util.regex common subset (no lookaround) so
#: the exact same string compiles identically in both engines.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask emails/phone numbers with typed placeholder tokens and count
    the hits — the standard pre-training scrub pass.

    Pure ``regexp_count``/``regexp_replace`` built-ins: one codegen'd
    projection, no shuffle, scales with input splits. Phones are counted
    AFTER email masking so an address like ``555-123-4567@x.com`` is
    attributed to exactly one category (replacement order is part of the
    operator contract).
    """
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    masked = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_phones = F.regexp_count(masked, F.lit(PHONE_RE))
    masked = F.regexp_replace(masked, PHONE_RE, "<PHONE>")
    return (df.withColumn("n_emails", n_emails)
              .withColumn("n_phones", n_phones)
              .withColumn("redacted", masked))


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals, step 1 of 2: normalized word
    array + duplicate-word ratio (1 - distinct/total), plus the bigram
    array for the top-bigram-fraction aggregation downstream.

    The word array is materialized as a real column before any lambda
    touches it (expressions inside higher-order-function lambdas
    re-evaluate per element), and the bigram builder is guarded with
    ``when(n >= 2)`` because ``sequence(1, 0)`` is DESCENDING in Spark
    and would make ``slice``/index math throw under ANSI mode.
    """
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    out = df.withColumn("__words", F.split(norm, " "))
    n = F.size("__words")
    dup = (F.lit(1.0)
           - F.size(F.array_distinct("__words")).cast("double") / n)
    bigrams = F.when(n >= 2, F.expr(
        "transform(sequence(1, size(__words) - 1), "
        "i -> concat(__words[i-1], ' ', __words[i]))"
    )).otherwise(F.array().cast("array<string>"))
    return (out.withColumn("dup_word_ratio", dup)
               .withColumn("__bigrams", bigrams))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 over the
    whitespace-normalized, lowercased text — the canonical-form hash
    used for exact dedup at scale (hash keys shuffle uniformly)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumn("fingerprint", F.md5(norm.cast("binary")))


def bigram_pmi(df: DataFrame, text_col: str = "text",
               min_count: int = 5, top_k: int = 30) -> DataFrame:
    """Collocation mining (B24): top adjacent-word bigrams by pointwise
    mutual information, PMI = ln(N * c(ab) / (c(a) * c(b))).

    One tokenize pass feeds BOTH count tables: bigrams explode to
    (w1, w2) pairs, unigrams to tokens; each aggregates with map-side
    partial combine (shuffle width = vocabulary, not corpus). The bigram
    table then picks up c(a) and c(b) via two equi-joins on the
    vocabulary-sized unigram table — at web scale a ~10M-row vocab is
    borderline broadcastable, but the shuffle join is uniform (token
    frequency skew lives in the COUNTS, already aggregated, not the join
    keys). N arrives as a broadcast one-row cross join.

    Ranking is by (count desc, w1, w2) — integer-deterministic, so the
    top-k frontier never depends on floating-point PMI ties; PMI itself
    is reported rounded.
    """
    df = spread_for_cpu(df)
    toks_arr = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " ")),
        r"\s+")
    # ONE tokenize scan feeds both count tables: unigram structs
    # (w2=NULL) and bigram structs ride a single concat'd explode into a
    # single (w1, w2) aggregate, then split by w2 nullness — the corpus
    # is read and regex-tokenized once, not once per table. explode_outer
    # (not explode) so InferFiltersFromGenerate can't clone the generator
    # into a pushed-down size() filter that re-tokenizes per row; the
    # CASE guards sequence(1, 0), which is DESCENDING in Spark.
    combined = (
        "concat("
        "transform(__toks, t -> struct(t AS w1, CAST(NULL AS STRING) AS w2)),"
        "CASE WHEN size(__toks) >= 2 THEN "
        "transform(sequence(1, size(__toks) - 1), "
        "i -> struct(element_at(__toks, i) AS w1, "
        "element_at(__toks, i + 1) AS w2)) "
        "ELSE CAST(array() AS array<struct<w1:string,w2:string>>) END)"
    )
    counts = (df.select(toks_arr.alias("__toks"))
                .select(F.explode_outer(F.expr(combined)).alias("p"))
                .where(F.col("p").isNotNull())
                .groupBy("p.w1", "p.w2")
                .agg(F.count(F.lit(1)).alias("n"))
                .persist())
    bg = (counts.where(F.col("w2").isNotNull())
                .select("w1", "w2", F.col("n").alias("n_pair")))
    uni = (counts.where(F.col("w2").isNull())
                 .select(F.col("w1").alias("tok"), F.col("n").alias("n_tok")))
    total = uni.agg(F.sum("n_tok").alias("n_total"))
    scored = (bg.where(F.col("n_pair") >= min_count)
                .join(uni.select(F.col("tok").alias("w1"),
                                 F.col("n_tok").alias("n_w1")), "w1")
                .join(uni.select(F.col("tok").alias("w2"),
                                 F.col("n_tok").alias("n_w2")), "w2")
                .crossJoin(F.broadcast(total))
                .withColumn("pmi", F.round(
                    F.log(F.col("n_pair") * F.col("n_total") /
                          (F.col("n_w1") * F.col("n_w2"))), 4)))
    return (scored
            .orderBy(F.col("n_pair").desc(), "w1", "w2")
            .limit(top_k)
            .select("w1", "w2", "n_pair", "pmi"))


def token_entropy(df: DataFrame, text_col: str = "text",
                  group_col: str = "source") -> DataFrame:
    """Corpus diversity (B25): Shannon entropy of the token distribution
    per group, H = ln(N) - sum(n·ln n)/N over token counts n.

    That algebraic form needs only per-token counts (exact integers) —
    no per-row probabilities, so the only floating work is one ln per
    DISTINCT token. Two shuffles: token counts (vocabulary-wide,
    map-side combined) then the per-group reduction (group-wide, tiny).
    Low entropy flags templated/boilerplate sources — the corpus-
    curation signal complementing `quality_score` and
    `repetition_signals`.
    """
    df = spread_for_cpu(df)
    toks_arr = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " ")),
        r"\s+")
    counts = (df.select(F.col(group_col).alias("grp"),
                        F.explode_outer(toks_arr).alias("tok"))
                .where(F.col("tok").isNotNull())
                .groupBy("grp", "tok")
                .agg(F.count(F.lit(1)).alias("n")))
    return (counts.groupBy("grp")
                  .agg(F.sum("n").alias("n_tokens"),
                       F.count(F.lit(1)).alias("n_vocab"),
                       F.sum(F.col("n") * F.log("n")).alias("__s"))
                  .select(F.col("grp").alias(group_col), "n_tokens",
                          "n_vocab",
                          F.round(F.log("n_tokens")
                                  - F.col("__s") / F.col("n_tokens"), 4)
                           .alias("entropy")))


def chunk_tokens(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", size: int = 32,
                 stride: int = 16) -> DataFrame:
    """Document chunking (B28): split each document into overlapping
    fixed-size token windows — the unit-of-work transform in front of
    every tokenize-and-train pipeline (context windows, embedding
    inputs, dedup shingling at chunk granularity).

    Token offsets come from ``sequence(1, greatest(n-size+1, 1),
    stride)`` — ``greatest(..., 1)`` both guards Spark's DESCENDING
    ``sequence(1, 0)`` trap and guarantees short documents still emit
    exactly one (possibly partial) chunk. The tokens array is
    materialized as a column BEFORE the explode so the generator never
    re-runs the regex per element, and ``explode_outer`` (not
    ``explode``) prevents InferFiltersFromGenerate from cloning the
    tokenizer into a pushed-down ``size() > 0`` filter.

    Scale: embarrassingly parallel — one projection pass, no shuffle;
    output partitioning inherits the input's, so a downstream
    ``repartition`` on chunk hash is the only shuffle a full
    chunk-then-dedup pipeline ever pays. Row expansion is bounded by
    ceil(n_tokens / stride) per document.
    """
    df = spread_for_cpu(df)
    words = F.split(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))),
        " ")
    base = df.select(F.col(id_col), words.alias("__w"),
                     F.size(words).alias("__n"))
    starts = F.expr(
        f"sequence(1, greatest(__n - {size} + 1, 1), {stride})")
    return (base
            .select(id_col, "__w", "__n",
                    F.explode_outer(starts).alias("chunk_start"))
            .where(F.col("chunk_start").isNotNull())
            .select(
                id_col,
                "chunk_start",
                F.least(F.lit(size),
                        F.col("__n") - F.col("chunk_start") + 1)
                 .cast("int").alias("n_tokens"),
                F.md5(F.array_join(
                    F.slice("__w", F.col("chunk_start"), F.lit(size)),
                    " ").cast("binary")).alias("chunk_md5")))


def unigram_surprisal(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      group_col: str = "source") -> DataFrame:
    """Unigram-LM surprisal scoring (B29): per-document mean negative
    log-probability under the corpus's own unigram distribution — the
    cheap perplexity proxy used to rank documents for quality filtering
    (high surprisal = rare-token soup, low = boilerplate).

    Two corpus passes by design: pass 1 builds the token-frequency
    table (vocabulary-wide shuffle, map-side combined), pass 2 re-reads
    and joins each token against it. Re-tokenizing beats caching — a
    persisted exploded-token stream is corpus-sized state that evicts
    everything else at 100 TB, while the regex pass is linear CPU on
    stateless scans. The frequency table is vocabulary-sized (~10M rows
    web-scale) so Spark broadcasts it at test scale and AQE picks a
    shuffled hash join beyond the threshold; either way the fact stream
    shuffles at most once (doc_id) after the map-side lookup.

    Outputs are per-group aggregates of doc-level means, rounded only
    at the boundary; ln parity between JVM libm and DuckDB holds to the
    last ulp and washes out under round(,4).
    """
    df = spread_for_cpu(df)
    toks_arr = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " ")),
        r"\s+")
    toks = (df.select(F.col(id_col), F.col(group_col),
                      F.explode_outer(toks_arr).alias("tok"))
              .where(F.col("tok").isNotNull()))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    total = freq.agg(F.sum("n_tok").alias("n_total"))
    doc_nll = (toks.join(freq, "tok")
                   .crossJoin(F.broadcast(total))
                   .groupBy(id_col, group_col)
                   .agg(F.avg(-F.log(F.col("n_tok").cast("double")
                                     / F.col("n_total"))).alias("__nll")))
    return (doc_nll.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("__nll"), 4).alias("avg_surprisal"),
                 F.round(F.max("__nll"), 4).alias("max_surprisal")))


def gopher_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public),
    adapted to the signals this corpus exposes: word-count bounds,
    mean-word-length bounds, symbol-to-char ratio, alphabetic-word
    ratio, and minimum stopword evidence. Each rule is a boolean
    column plus a combined ``pass_gopher`` flag. All counts are
    regexp/split built-ins over one codegen'd projection — ratios are
    integer-over-integer, so every flag is engine-exact.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    # mean word length is measured on whitespace-NORMALIZED text
    # (runs of spaces/tabs collapse to one separator), so it is exactly
    # Σ len(token) / n_words — un-normalized runs would otherwise count
    # as word characters and inflate the metric past the Gopher bound
    norm = F.regexp_replace(F.trim(t), r"\s+", " ")
    n_words = F.size(F.split(norm, " "))
    mean_wl = (F.length(norm) - n_words + 1).cast("double") / n_words
    n_sym = F.regexp_count(t, F.lit(r"[#…]"))
    n_alpha = F.regexp_count(t, F.lit(r"\b[A-Za-z]+\b"))
    n_stop = F.regexp_count(
        F.lower(t), F.lit(r"\b(the|a|of|to|and|is|in|that|it|for)\b"))
    f_wc = (n_words >= 50) & (n_words <= 100000)
    f_wl = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    f_sym = n_sym.cast("double") <= 0.1 * n_chars
    f_alpha = n_alpha.cast("double") >= 0.8 * n_words
    f_stop = n_stop >= 2
    return (df.withColumn("n_words", n_words)
              .withColumn("mean_word_len", F.round(mean_wl, 4))
              .withColumn("flag_word_count", f_wc.cast("int"))
              .withColumn("flag_word_len", f_wl.cast("int"))
              .withColumn("flag_symbol_ratio", f_sym.cast("int"))
              .withColumn("flag_alpha_ratio", f_alpha.cast("int"))
              .withColumn("flag_stopwords", f_stop.cast("int"))
              .withColumn("pass_gopher",
                          (f_wc & f_wl & f_sym & f_alpha & f_stop)
                          .cast("int")))
