"""Text-analysis operators: language ID, quality scoring, token stats,
document fingerprinting. All pure Column expressions (JVM-side, codegen'd) —
the arithmetic is deliberately restricted to constructs with exact DuckDB
twins (no regex-dialect dependence, no float ambiguity beyond final rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker words per language for the n-gram/stopword heuristic; checked
# against ' word '-padded text so boundaries are cheap and dialect-free.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and"],
    "de": ["der", "und", "die"],
    "es": ["el", "la", "y"],
    "fr": ["le", "la", "et"],
    "zh": ["de", "shi", "le"],
}

STOPWORDS = ["the", "a", "and", "of", "to"]


def _count_occurrences(text: Column, word: str) -> Column:
    """Occurrences of `word` as a whitespace-delimited token."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def _count_occurrences_sql(text_expr: str, word: str) -> str:
    needle = f" {word} "
    return (
        f"CAST((length(' ' || {text_expr} || ' ') - "
        f"length(replace(' ' || {text_expr} || ' ', '{needle}', ''))) / {len(needle)} AS INT)"
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language marker-word scores + argmax prediction (deterministic
    tie-break: language name order)."""
    text = F.col(text_col)
    scored = df
    for lang, words in LANG_MARKERS.items():
        s = None
        for w in words:
            c = _count_occurrences(text, w)
            s = c if s is None else s + c
        scored = scored.withColumn(f"score_{lang}", s)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = None
    for lang in langs:
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return scored.withColumn("pred_lang", pred)


def lang_scores_oracle() -> str:
    score_cols = []
    for lang, words in LANG_MARKERS.items():
        expr = " + ".join(_count_occurrences_sql("text", w) for w in words)
        score_cols.append(f"({expr}) AS score_{lang}")
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
WITH scored AS (SELECT doc_id, lang, {', '.join(score_cols)} FROM documents)
SELECT doc_id, lang, {case} AS pred_lang FROM scored
"""


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: char/word counts, mean word length, stopword
    ratio, and a composite quality score in [0,1]."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_spaces = n_chars - F.length(F.replace(text, F.lit(" "), F.lit("")))
    n_words = n_spaces + 1
    stop = None
    for w in STOPWORDS:
        c = _count_occurrences(text, w)
        stop = c if stop is None else stop + c
    mean_wl = (n_chars - n_spaces) / n_words
    stop_ratio = stop / n_words
    # crude composite: reward 3-8 char mean word length and 2-60% stopwords
    score = (
        F.when((mean_wl >= 3) & (mean_wl <= 8), 0.5).otherwise(0.0)
        + F.when((stop_ratio >= 0.02) & (stop_ratio <= 0.6), 0.5).otherwise(0.0)
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def quality_features_oracle() -> str:
    stop = " + ".join(_count_occurrences_sql("text", w) for w in STOPWORDS)
    return f"""
WITH t AS (
  SELECT doc_id,
         length(text) AS n_chars_calc,
         length(text) - length(replace(text, ' ', '')) AS n_spaces,
         ({stop}) AS stop
  FROM documents
)
SELECT doc_id, n_chars_calc,
       CAST(n_spaces + 1 AS BIGINT) AS n_words,
       round((n_chars_calc - n_spaces) * 1.0 / (n_spaces + 1), 4) AS mean_word_len,
       round(stop * 1.0 / (n_spaces + 1), 4) AS stopword_ratio,
       round((CASE WHEN (n_chars_calc - n_spaces) * 1.0 / (n_spaces + 1) BETWEEN 3 AND 8
                   THEN 0.5 ELSE 0.0 END)
           + (CASE WHEN stop * 1.0 / (n_spaces + 1) BETWEEN 0.02 AND 0.6
                   THEN 0.5 ELSE 0.0 END), 2) AS quality_score
FROM t
"""


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, chars; plus a
    BPE-ish proxy (tokens ~ chars/4, the standard subword estimate)."""
    text = F.col(text_col)
    toks = F.split(text, " ")
    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length(text).alias("n_chars_calc"),
        F.ceil(F.length(text) / 4.0).cast("long").alias("bpe_token_estimate"),
    )


TOKEN_STATS_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       length(text) AS n_chars_calc,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_token_estimate
FROM documents
"""


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the space-collapsed text (content hash
    robust to whitespace-only edits), plus a 60-bit prefix as a numeric join
    key (conv() decodes 15 hex chars -> fits a BIGINT exactly)."""
    norm = F.replace(F.col(text_col), F.lit(" "), F.lit(""))
    fp = F.md5(norm)
    return df.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fp64"),
    )


def fingerprint_oracle() -> str:
    """DuckDB has no conv(); decode the 15-char hex prefix with an exact
    BIGINT polynomial (powers of 16 as integer literals — doubles above 2^53
    would corrupt the high digits)."""
    terms = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(fp, {i + 1}, 1)) - 1 AS BIGINT) * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"""
WITH t AS (SELECT doc_id, md5(replace(text, ' ', '')) AS fp FROM documents)
SELECT doc_id, fp AS fingerprint, ({terms}) AS fp64 FROM t
"""
