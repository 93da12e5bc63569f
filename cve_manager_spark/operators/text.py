"""Text analysis operators over a document corpus (SURVEY §2.8 N4).

All expressions are built-in `pyspark.sql.functions` — they run inside
whole-stage codegen with zero Python in the hot path, so they scale to a
100 TB corpus as pure narrow map work (no shuffle except the explicit
aggregations).

Operators:
- tokenize / token counts (whitespace + a BPE-ish regex segmentation)
- quality scoring (length, word stats, punctuation/stopword ratios)
- language-ID (marker-word ratio heuristic; deterministic formula)
- document fingerprinting (polynomial rolling hash, engine-agnostic)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cve_manager_spark.functions.helpers import fan_out, values_relation

# A small English stopword core; enough for ratio features.
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

# BPE-ish segmentation: letter runs | digit runs | single non-space symbol.
BPE_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

FINGERPRINT_MOD = 2147483647  # 2^31 - 1, fits exactly in a long product


def words(text: Column) -> Column:
    """Whitespace tokenization, empty tokens removed."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def token_count_ws(text: Column) -> Column:
    return F.size(words(text))


def token_count_bpe(text: Column) -> Column:
    """Token count under the BPE-ish regex segmentation."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), F.lit(0)))


def stopword_count(text: Column) -> Column:
    return F.size(F.filter(words(F.lower(text)), _is_stopword))


def _is_stopword(tok: Column) -> Column:
    # isin = ONE py4j call (In expression); the chained-OR form crossed
    # the boundary twice per stopword and its driver build time showed
    # up in every quality-feature query (guide §5). Same nulls/semantics
    # (tokens from split are never null; In == the OR chain otherwise).
    return tok.isin(*STOPWORDS)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add length/word/punct/stopword quality features.

    Ratios divide doubles derived from exact integer counts → bitwise
    deterministic across engines and runs.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    w = words(t)
    n_words = F.size(w)
    n_stop = F.size(F.filter(words(F.lower(t)), _is_stopword))
    n_punct = F.length(F.regexp_replace(t, r"[a-zA-Z0-9\s]", ""))
    return (
        df.withColumn("q_n_chars", n_chars.cast("bigint"))
        .withColumn("q_n_words", n_words.cast("bigint"))
        .withColumn(
            "q_avg_word_len",
            F.when(
                n_words > 0,
                F.length(F.regexp_replace(t, r"\s", "")).cast("double") / n_words,
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "q_punct_ratio",
            F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "q_stop_ratio",
            F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(F.lit(0.0)),
        )
    )


# Marker words per language for the n-gram/marker heuristic. The corpus is
# synthetic (same vocabulary across langs), so this demonstrates the
# operator shape: per-language marker ratios + deterministic argmax.
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "la", "los", "de"),
}


def _marker_count(toks: Column, markers: tuple[str, ...]) -> Column:
    def is_marker(tok: Column) -> Column:
        cond = tok == F.lit(markers[0])
        for m in markers[1:]:
            cond = cond | (tok == F.lit(m))
        return cond

    return F.size(F.filter(toks, is_marker))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: highest marker-word ratio wins; ties and
    zero-evidence rows fall back to 'und'. Deterministic tie-break by
    fixed language order (en, de, fr, es)."""
    toks = words(F.lower(F.col(text_col)))
    counts = {lang: _marker_count(toks, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    pred = F.lit("und")
    # reversed so earlier languages win ties via later .when overwrite order
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when((counts[lang] > 0) & (counts[lang] == best), F.lit(lang)).otherwise(pred)
    return df.withColumn("pred_lang", pred)


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over characters, mod 2^31-1.

    Engine-agnostic (same formula runs in DuckDB via list_reduce), so it
    serves as a portable content fingerprint for dedup bucketing.
    """
    codes = F.transform(
        F.filter(F.split(text, ""), lambda c: c != ""), lambda c: F.ascii(c).cast("bigint")
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD,
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Train a byte-pair-encoding vocabulary: the ``n_merges`` most
    frequent adjacent symbol pairs, merged greedily in order (Sennrich
    et al. 2016). Returns (rank, left, right, merged, pair_count).

    Scale shape — the part that matters at 100 TB: the CORPUS is
    touched exactly once, to build the (word, count) vocabulary
    relation; every merge round then runs on that vocabulary table
    (bounded by distinct words, not corpus size), as one pair-count
    hash aggregate + a deterministic argmax (count desc, pair asc) +
    an Arrow-batched left-to-right merge application. The driver sees
    ONE row per round. Word symbols start as characters plus a '</w>'
    end marker, the standard word-internal BPE.

    Deterministic: integer counts, lexicographic tie-break, greedy
    non-overlapping left-to-right application — same corpus, same
    merges, on 1 core or 1000 executors.
    """
    from pyspark.sql.functions import pandas_udf

    vocab = (
        fan_out(df)
        .select(F.explode(words(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit("</w>"))
            ).alias("syms"),
            "cnt",
        )
        .persist()
    )
    vocab.count()

    merges = []
    for rank in range(n_merges):
        pairs = (
            vocab.select(
                "cnt",
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(0), F.size("syms") - 2),
                            lambda i: F.struct(
                                F.element_at("syms", i + 1).alias("l"),
                                F.element_at("syms", i + 2).alias("r"),
                            ),
                        ),
                    ).otherwise(F.array()),
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["pair_count"] == 0:
            break
        left, right, cnt = pairs[0]["l"], pairs[0]["r"], int(pairs[0]["pair_count"])
        merges.append((rank, left, right, left + right, cnt))

        @pandas_udf("array<string>")
        def apply_merge(arrs: pd.Series) -> pd.Series:
            out = []
            for syms in arrs:
                res, i = [], 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            return pd.Series(out)

        new_vocab = vocab.select(
            apply_merge(F.col("syms")).alias("syms"), "cnt"
        ).persist()
        new_vocab.count()
        vocab.unpersist()
        vocab = new_vocab

    spark = df.sparkSession
    vocab.unpersist()
    return values_relation(
        spark,
        merges,
        "rank int, left string, right string, merged string, pair_count bigint",
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with a TRAINED merge list — the inference half of
    :func:`bpe_train`: per word, start from characters + '</w>' and
    apply each merge in rank order, greedy left-to-right non-overlapping
    (bit-identical to the trainer's own application rule, so encoding
    the training corpus reproduces the trainer's final symbol state).
    Returns (id, n_words, n_tokens) — n_tokens counts post-merge symbols
    including the '</w>' markers, so with zero merges n_tokens =
    n_chars_in_words + n_words.

    Scale shape: a narrow Arrow-batched map — the merge list rides as a
    per-task closure (KBs), and a per-batch word→length memo collapses
    the Zipf head (most tokens are a few thousand distinct words), so
    per-row cost is dominated by the long tail. No shuffle; aggregate
    downstream at whatever grain the fertility report needs.
    """
    from pyspark.sql.functions import pandas_udf

    merge_list = [(str(l), str(r)) for l, r in merges]

    @pandas_udf("struct<n_words: bigint, n_tokens: bigint>")
    def encode_stats(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            hit = memo.get(w)
            if hit is not None:
                return hit
            syms = list(w) + ["</w>"]
            for left, right in merge_list:
                # cheap reject: a pair can only fire if both symbols are
                # currently present — skips the scan for most (word,
                # merge) combinations
                if left not in syms or right not in syms:
                    continue
                res, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            memo[w] = len(syms)
            return memo[w]

        n_words, n_tokens = [], []
        for t in texts:
            ws = [w for w in (t or "").lower().split() if w]
            n_words.append(len(ws))
            n_tokens.append(sum(word_tokens(w) for w in ws))
        return pd.DataFrame({"n_words": n_words, "n_tokens": n_tokens})

    return df.select(
        F.col(id_col).alias("id"), encode_stats(F.col(text_col)).alias("s")
    ).select("id", F.col("s.n_words").alias("n_words"), F.col("s.n_tokens").alias("n_tokens"))
