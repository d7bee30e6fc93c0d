"""Text-analysis operators: language ID, quality scoring, token stats,
document fingerprinting. All pure Column expressions (JVM-side, codegen'd) —
the arithmetic is deliberately restricted to constructs with exact DuckDB
twins (no regex-dialect dependence, no float ambiguity beyond final rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from impalatogo_spark.session import tracked_local_checkpoint as _ckpt

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


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    duplicate-word fraction, top-word mass, duplicate-bigram fraction, and a
    keep/reject flag at the paper's thresholds.

    Scale shape: word stats come from explode -> two-level groupBy — the
    (doc_id, word) pre-aggregation is map-side combinable, so the only full
    shuffle is keyed by doc_id and carries one row per distinct word, not one
    per token. Bigram stats are pure array expressions (no shuffle); the
    final doc_id join co-partitions with the aggregation output. A HOF
    count-per-distinct-word alternative would be shuffle-free but O(words x
    distinct) per row — quadratic on long documents, rejected for 100 TB.
    """
    from impalatogo_spark.operators import split_words

    words = split_words(df.select("doc_id", F.col(text_col)),
                        text_col=text_col, out="w")
    word_stats = (
        words.select("doc_id", F.explode("w").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.count("*").alias("n_distinct_words"),
            F.max("cnt").alias("top_cnt"),
        )
    )
    # `w` sits behind split_words's Generate barrier: without it the split
    # would CollapseProject-inline into the bigram transform lambda and
    # re-evaluate per element.
    bigram_stats = words.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(w) >= 2 THEN"
            " transform(sequence(1, size(w) - 1),"
            "           i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))"
            " ELSE array() END"
        ).alias("bg"),
    ).select(
        "doc_id",
        F.size("bg").cast("long").alias("n_bigrams"),
        F.size(F.array_distinct("bg")).cast("long").alias("n_distinct_bigrams"),
    )
    j = word_stats.join(bigram_stats, "doc_id")
    dup_w = F.lit(1.0) - F.col("n_distinct_words") / F.col("n_words").cast("double")
    top_w = F.col("top_cnt") / F.col("n_words").cast("double")
    dup_b = F.when(
        F.col("n_bigrams") > 0,
        F.lit(1.0) - F.col("n_distinct_bigrams") / F.col("n_bigrams").cast("double"),
    ).otherwise(F.lit(0.0))
    return j.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "n_distinct_words",
        F.round(dup_w, 6).alias("dup_word_frac"),
        F.round(top_w, 6).alias("top_word_frac"),
        F.round(dup_b, 6).alias("dup_bigram_frac"),
        # thresholds compared on the unrounded doubles — identical IEEE
        # expression trees on both engines, so the flag is deterministic.
        ((dup_w < 0.3) & (top_w < 0.2) & (dup_b < 0.2)).alias("keep"),
    )


REPETITION_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
ws AS (
  SELECT doc_id, sum(cnt) AS n_words, count(*) AS n_distinct_words,
         max(cnt) AS top_cnt
  FROM (SELECT doc_id, word, count(*) AS cnt
        FROM (SELECT doc_id, unnest(w) AS word FROM w)
        GROUP BY doc_id, word)
  GROUP BY doc_id),
bs AS (
  SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
         CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct_bigrams
  FROM (SELECT doc_id,
               CASE WHEN len(w) >= 2
                    THEN list_transform(range(1, len(w)),
                                        i -> w[i] || ' ' || w[i + 1])
                    ELSE []::VARCHAR[] END AS bg
        FROM w)),
j AS (SELECT * FROM ws JOIN bs USING (doc_id))
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, n_distinct_words,
       round(1.0 - n_distinct_words / CAST(n_words AS DOUBLE), 6) AS dup_word_frac,
       round(top_cnt / CAST(n_words AS DOUBLE), 6) AS top_word_frac,
       round(CASE WHEN n_bigrams > 0
                  THEN 1.0 - n_distinct_bigrams / CAST(n_bigrams AS DOUBLE)
                  ELSE 0.0 END, 6) AS dup_bigram_frac,
       ((1.0 - n_distinct_words / CAST(n_words AS DOUBLE)) < 0.3
        AND (top_cnt / CAST(n_words AS DOUBLE)) < 0.2
        AND (CASE WHEN n_bigrams > 0
                  THEN 1.0 - n_distinct_bigrams / CAST(n_bigrams AS DOUBLE)
                  ELSE 0.0 END) < 0.2) AS keep
FROM j
"""


def contamination_pairs(
    df: DataFrame, text_col: str = "text", bench_mod: int = 100, n: int = 3,
    bench_cap: int = 5000,
) -> DataFrame:
    """Benchmark-contamination detection: for every document, the fraction of
    its distinct word n-grams that also appear in a "benchmark" document
    (here the deterministic stand-in doc_id % bench_mod == 0 AND doc_id <
    bench_cap; in production a fixed eval corpus). Reports pairs with
    containment >= 10%, compared in exact integer arithmetic
    (overlap * 10 >= n_sh) — no float threshold boundary.

    Scale shape: the benchmark side of the shingle join is broadcast — real
    decontamination corpora (eval benchmarks) are MB-sized against TB-scale
    training data, so the join is map-side with zero shuffle of the big
    side; the only shuffle is the (doc_id, bench_id) overlap count, already
    reduced to matching shingles. `bench_cap` keeps the stand-in benchmark
    FIXED-SIZE like a real one (r07: the unbounded doc_id % mod benchmark
    grew 1% OF THE CORPUS, and the sf1 audit measured the overlap shuffle
    in the SUPER class — 90x on 10x data — purely from the stand-in's
    growth; below the cap, i.e. every driver SF up to sf0.1, behavior is
    unchanged).
    """
    from impalatogo_spark.operators import split_words

    def _shingled(d: DataFrame) -> DataFrame:
        # split behind split_words's Generate barrier — a plain projection
        # would inline into the transform lambda and re-evaluate split()
        # per element (7.6x measured at sf0.1)
        words = split_words(d.select("doc_id", F.col(text_col)),
                            text_col=text_col, out="w")
        return words.select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    f"CASE WHEN size(w) >= {n} THEN"
                    f" transform(sequence(1, size(w) - {n - 1}),"
                    f"           i -> concat_ws(' ', "
                    + ", ".join(f"element_at(w, i + {k})" for k in range(n))
                    + ")) ELSE array() END"
                )
            ).alias("sh"),
        )

    e = _shingled(df).select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("s")
    )
    # the benchmark side shingles only its own 1% — the filter reaches the
    # scan instead of re-deriving from the full exploded relation
    bench = _shingled(
        df.filter((F.col("doc_id") % bench_mod == 0)
                  & (F.col("doc_id") < bench_cap))
    ).select(
        F.col("doc_id").alias("bench_id"), F.explode("sh").alias("s")
    )
    m = (
        e.join(F.broadcast(bench), "s")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("overlap"), F.max("n_sh").alias("n_sh"))
    )
    return (
        m.filter(F.col("overlap") * 10 >= F.col("n_sh"))
        .select(
            "doc_id",
            "bench_id",
            "overlap",
            F.col("n_sh").cast("long").alias("n_sh"),
            F.round(F.col("overlap") / F.col("n_sh").cast("double"), 6).alias(
                "containment"
            ),
        )
        .orderBy("doc_id", "bench_id")
    )


def contamination_oracle(bench_mod: int = 100, n: int = 3,
                         bench_cap: int = 5000) -> str:
    grams = " || ' ' || ".join(f"w[i + {k}]" for k in range(n))
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id,
              list_distinct(CASE WHEN len(w) >= {n}
                   THEN list_transform(range(1, len(w) - {n - 2}), i -> {grams})
                   ELSE []::VARCHAR[] END) AS sh
       FROM w),
e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh),
bench AS (SELECT doc_id AS bench_id, s FROM e
          WHERE doc_id % {bench_mod} = 0 AND doc_id < {bench_cap}),
m AS (SELECT e.doc_id, bench_id, count(*) AS overlap, max(n_sh) AS n_sh
      FROM e JOIN bench USING (s) WHERE e.doc_id <> bench_id
      GROUP BY e.doc_id, bench_id)
SELECT doc_id, bench_id, overlap, CAST(n_sh AS BIGINT) AS n_sh,
       round(overlap / CAST(n_sh AS DOUBLE), 6) AS containment
FROM m WHERE overlap * 10 >= n_sh
ORDER BY doc_id, bench_id
"""


def chunk_windows(df: DataFrame, text_col: str = "text",
                  chunk: int = 50, stride: int = 40) -> DataFrame:
    """Fixed-size token windows with overlap (chunk=50, stride=40 -> 10-token
    overlap): the standard context-window chunking step before tokenization
    in a training pipeline. Pure array expressions — split once, explode the
    start offsets, slice per window; no shuffle at all (fully pipelined with
    the scan), so it streams at 100 TB. Chunks are emitted as md5 digests +
    token counts (the downstream contract is (doc, window) identity, and the
    compare stays compact)."""
    w = F.col("__w")
    starts = df.select(
        F.col("doc_id"), F.split(F.col(text_col), " ").alias("__w")
    ).filter(F.size(w) >= 1).select(
        "doc_id",
        "__w",
        F.explode(F.sequence(F.lit(1), F.size(w), F.lit(stride))).alias("start"),
    )
    piece = F.slice(F.col("__w"), F.col("start"), chunk)
    return starts.select(
        "doc_id",
        (F.floor((F.col("start") - 1) / stride) + 1).cast("int").alias("chunk_idx"),
        F.col("start").cast("int").alias("start"),
        F.size(piece).alias("n_tok"),
        F.md5(F.concat_ws(" ", piece)).alias("chunk_md5"),
    )


def chunk_windows_oracle(chunk: int = 50, stride: int = 40) -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id, w, unnest(range(1, len(w) + 1, {stride})) AS start FROM w
      WHERE len(w) >= 1),
sl AS (SELECT doc_id, CAST((start - 1) // {stride} + 1 AS INT) AS chunk_idx,
              CAST(start AS INT) AS start,
              list_slice(w, start, start + {chunk - 1}) AS piece
       FROM s)
SELECT doc_id, chunk_idx, start, CAST(len(piece) AS INT) AS n_tok,
       md5(array_to_string(piece, ' ')) AS chunk_md5
FROM sl
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction: replace emails / IPv4 addresses / US-format phone
    numbers with typed placeholder tokens and report per-doc match counts —
    the scrubbing pass every training-data pipeline runs before release.

    The synthetic corpus contains no PII, so a deterministic contact block
    is appended per doc (doc_id-derived, same construction in the oracle —
    the text_contamination stand-in pattern): a variable number of emails
    (doc_id % 3 extras), one phone, one IP. Redaction itself is the real
    regex logic under test.

    Scale: pure per-row regexp_replace chain inside whole-stage codegen —
    no shuffle, no UDF; streams at any scale. Patterns stay in the
    RE2-and-Java common subset so one pattern string serves Spark and the
    DuckDB oracle."""
    aug = F.concat_ws(
        " ",
        F.col(text_col),
        F.repeat(F.concat(F.lit("alt"), F.col("doc_id"), F.lit("@mail.org ")),
                 (F.col("doc_id") % 3).cast("int")),
        F.concat(F.lit("user"), F.col("doc_id"), F.lit("@example.com")),
        F.concat(F.lit("555-"), F.lpad(F.col("doc_id") % 1000, 3, "0"),
                 F.lit("-"), F.lpad(F.col("n_chars") % 10000, 4, "0")),
        F.concat(F.lit("10."), F.col("doc_id") % 256, F.lit("."),
                 F.col("n_chars") % 256, F.lit(".7 end")),
    )
    d = df.select("doc_id", aug.alias("__aug"))
    a = F.col("__aug")
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(a, _PII_EMAIL, "<EMAIL>"),
            _PII_IP, "<IP>"),
        _PII_PHONE, "<PHONE>")
    return d.select(
        "doc_id",
        (F.size(F.split(a, _PII_EMAIL)) - 1).alias("n_emails"),
        (F.size(F.split(a, _PII_IP)) - 1).alias("n_ips"),
        (F.size(F.split(a, _PII_PHONE)) - 1).alias("n_phones"),
        F.length(red).alias("red_len"),
        F.md5(red).alias("red_md5"),
    ).orderBy("doc_id")


def pii_redact_oracle() -> str:
    email, ip, phone = _PII_EMAIL, _PII_IP, _PII_PHONE
    return f"""
WITH aug AS (
  SELECT doc_id,
         concat_ws(' ', text,
           repeat('alt' || doc_id || '@mail.org ', CAST(doc_id % 3 AS INT)),
           'user' || doc_id || '@example.com',
           '555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
             lpad(CAST(n_chars % 10000 AS VARCHAR), 4, '0'),
           '10.' || (doc_id % 256) || '.' || (n_chars % 256) || '.7 end') AS a
  FROM documents),
red AS (
  SELECT doc_id, a,
         regexp_replace(regexp_replace(regexp_replace(a,
           '{email}', '<EMAIL>', 'g'),
           '{ip}', '<IP>', 'g'),
           '{phone}', '<PHONE>', 'g') AS r
  FROM aug)
SELECT doc_id,
       len(string_split_regex(a, '{email}')) - 1 AS n_emails,
       len(string_split_regex(a, '{ip}')) - 1 AS n_ips,
       len(string_split_regex(a, '{phone}')) - 1 AS n_phones,
       length(r) AS red_len,
       md5(r) AS red_md5
FROM red ORDER BY doc_id
"""


# ===========================================================================
# End-to-end corpus curation (lang-ID -> quality -> exact dedup -> decontam)
# ===========================================================================

def curate(df: DataFrame, text_col: str = "text", lang: str = "en",
           bench_mod: int = 100, n: int = 3) -> DataFrame:
    """End-to-end pretraining-corpus curation verdict per document: language
    gate (marker-word argmax == `lang`), quality gate (composite score must
    hit 1.0), exact-dup gate (only the min-doc_id copy of each md5(text)
    survives), and benchmark-decontamination gate (no 3-gram containment hit
    against the broadcast benchmark corpus).

    Scale shape: lang+quality+fingerprint are ONE projection pass (no joins
    between the per-doc stages); the dup flag is a single window shuffle on
    the 32-byte fingerprint; the contamination hit-list is tiny (docs
    overlapping an MB-scale eval corpus) and broadcast back. Total cost at
    100 TB: one scan + one hash-partition exchange + the decontam shingle
    join whose big side never shuffles.

    Boolean gates are emitted as INT 0/1 so the Spark/DuckDB value hashes
    compare byte-identically.
    """
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
    quality = F.round(
        F.when((mean_wl >= 3) & (mean_wl <= 8), 0.5).otherwise(0.0)
        + F.when((stop_ratio >= 0.02) & (stop_ratio <= 0.6), 0.5).otherwise(0.0),
        2,
    )

    base = lang_scores(df, text_col).select(
        "doc_id",
        "pred_lang",
        quality.alias("quality_score"),
        F.md5(text).alias("fp"),
    )
    from pyspark.sql import Window as W

    dup = (F.col("doc_id") != F.min("doc_id").over(W.partitionBy("fp"))).cast("int")
    per_doc = base.withColumn("is_exact_dup", dup)

    contam_ids = (
        contamination_pairs(df, text_col, bench_mod=bench_mod, n=n)
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        per_doc.join(F.broadcast(contam_ids), "doc_id", "left")
        .withColumn("contaminated", F.coalesce(F.col("hit"), F.lit(0)))
        .withColumn(
            "kept",
            (
                (F.col("pred_lang") == lang)
                & (F.col("quality_score") == 1.0)
                & (F.col("is_exact_dup") == 0)
                & (F.col("contaminated") == 0)
            ).cast("int"),
        )
        .select("doc_id", "pred_lang", "quality_score", "is_exact_dup",
                "contaminated", "kept")
    )


def curate_oracle(lang: str = "en", bench_mod: int = 100, n: int = 3) -> str:
    """Composes the stage oracles (lang argmax, quality composite, window
    min-dedup, contamination CTE) into one statement mirroring curate()."""
    lang_q = lang_scores_oracle()
    qual_q = quality_features_oracle()
    contam_q = contamination_oracle(bench_mod=bench_mod, n=n)
    return f"""
WITH lang_v AS (SELECT doc_id, pred_lang FROM ({lang_q})),
qual_v AS (SELECT doc_id, quality_score FROM ({qual_q})),
dedup_v AS (
  SELECT doc_id,
         CAST(doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS INT)
           AS is_exact_dup
  FROM documents),
contam_v AS (SELECT DISTINCT doc_id FROM ({contam_q}))
SELECT l.doc_id, l.pred_lang, q.quality_score, d.is_exact_dup,
       CAST(c.doc_id IS NOT NULL AS INT) AS contaminated,
       CAST(l.pred_lang = '{lang}' AND q.quality_score = 1.0
            AND d.is_exact_dup = 0 AND c.doc_id IS NULL AS INT) AS kept
FROM lang_v l
JOIN qual_v q USING (doc_id)
JOIN dedup_v d ON d.doc_id = l.doc_id
LEFT JOIN contam_v c ON c.doc_id = l.doc_id
"""


def shard_stats(df: DataFrame, text_col: str = "text",
                n_shards: int = 16) -> DataFrame:
    """Deterministic corpus-shard assignment stats: shard = fp64 % n_shards
    over the whitespace-robust content fingerprint, with per-shard doc and
    token totals. This is the balanced-writer primitive: at 100 TB the write
    path is repartition(n_shards, shard) -> per-shard files, and the shard
    key is content-derived so re-runs land identically (no Spark-internal
    hash in the contract). One scan + one map-side-combined groupBy.
    """
    toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    fp = F.md5(F.replace(F.col(text_col), F.lit(" "), F.lit("")))
    fp64 = F.conv(F.substring(fp, 1, 15), 16, 10).cast("long")
    return (
        df.select(F.pmod(fp64, F.lit(n_shards)).alias("shard"),
                  toks.alias("n_tokens"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("shard")
    )


def shard_stats_oracle(n_shards: int = 16) -> str:
    fp_q = fingerprint_oracle()
    return f"""
WITH fp AS ({fp_q}),
t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents)
SELECT fp.fp64 % {n_shards} AS shard,
       count(*) AS n_docs,
       CAST(sum(t.n_tokens) AS BIGINT) AS total_tokens,
       min(t.n_tokens) AS min_tokens,
       max(t.n_tokens) AS max_tokens
FROM fp JOIN t ON t.doc_id = fp.doc_id
GROUP BY 1 ORDER BY 1
"""


def pack_sequences(df: DataFrame, text_col: str = "text",
                   budget: int = 512, n_shards: int = 16) -> DataFrame:
    """Greedy sequence packing: documents fill fixed token-budget training
    sequences in deterministic (shard, doc_id) order — the assembly step
    between a curated corpus and a trainer's fixed-length batches.

    Packing is inherently order-dependent, so a single global order would
    serialize; instead docs pack WITHIN their content-derived shard
    (shard_stats' key), which is how a 100 TB corpus is packed in practice:
    n_shards independent streams, each a window over its own partition. The
    only shuffle is the hash exchange on shard; the running token sum is a
    rows-unbounded window (no second pass). Docs longer than the budget get
    a sequence of their own (seq position still deterministic).

    seq_id = floor((cumsum_before) / budget): the standard streaming-fill
    bound — each sequence holds >= 1 doc and at most `budget` tokens of
    carried-over fill, identical in any engine with the same order.
    """
    from pyspark.sql import Window as W

    toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    fp = F.md5(F.replace(F.col(text_col), F.lit(" "), F.lit("")))
    shard = F.pmod(F.conv(F.substring(fp, 1, 15), 16, 10).cast("long"),
                   F.lit(n_shards))
    d = df.select(
        "doc_id", shard.alias("shard"), toks.alias("n_tokens")
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget).cast("long").alias("seq_id"),
        (cum - F.col("n_tokens") - F.floor((cum - F.col("n_tokens")) / budget)
         * budget).cast("long").alias("seq_offset"),
    )


def pack_sequences_oracle(budget: int = 512, n_shards: int = 16) -> str:
    fp_q = fingerprint_oracle()
    return f"""
WITH fp AS ({fp_q}),
d AS (
  SELECT t.doc_id, fp.fp64 % {n_shards} AS shard,
         CAST(len(string_split(t.text, ' ')) AS BIGINT) AS n_tokens
  FROM documents t JOIN fp ON fp.doc_id = t.doc_id),
c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS before
  FROM d)
SELECT doc_id, shard, n_tokens,
       CAST(floor(before * 1.0 / {budget}) AS BIGINT) AS seq_id,
       CAST(before - floor(before * 1.0 / {budget}) * {budget} AS BIGINT)
         AS seq_offset
FROM c
"""


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Corpus-level vocabulary: top-k words by total occurrences, with
    document frequency — the tokenizer-training / stopword-discovery scan.

    Scale shape: explode -> (word, doc_id) pre-aggregate (map-side combine
    collapses within-doc repeats before the shuffle) -> word-level aggregate
    (term frequency = sum of per-doc counts, doc frequency = count of docs)
    -> global top-k via TakeOrderedAndProject (no full sort). Ties broken by
    word for a deterministic cut.
    """
    from impalatogo_spark.operators import split_words

    words = split_words(df.select("doc_id", F.col(text_col)),
                        text_col=text_col, out="w")
    per_doc = (
        words.select("doc_id", F.explode("w").alias("word"))
        .groupBy("word", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    return (
        per_doc.groupBy("word")
        .agg(
            F.sum("tf").alias("term_freq"),
            F.count("*").alias("doc_freq"),
        )
        .orderBy(F.desc("term_freq"), "word")
        .limit(k)
    )


def vocab_topk_oracle(k: int = 100) -> str:
    return f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
per_doc AS (SELECT word, doc_id, count(*) AS tf FROM w GROUP BY 1, 2)
SELECT word, CAST(sum(tf) AS BIGINT) AS term_freq,
       count(*) AS doc_freq
FROM per_doc GROUP BY word
ORDER BY term_freq DESC, word LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Hashing-trick linear quality classifier (fastText/CCNet-shaped gate)
# ---------------------------------------------------------------------------

def classifier_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Linear text classifier via the hashing trick: each token hashes to an
    integer weight, the document score is the weight sum — the shape of a
    fastText-style quality gate (CCNet / RedPajama filtering) run at corpus
    scale, where the "model" is a token->weight lookup fused into the scan.

    Weights here are md5-derived stand-ins (w = hash(token) % 101 - 50,
    i.e. [-50, 50]) so the operator is deterministic and oracle-exact; a
    real deployment broadcasts the trained weight table and the plan is
    identical. Everything is integer arithmetic: the keep decisions
    (sum >= 0, mean weight >= 0.5) are exact BIGINT comparisons with no
    float threshold to wobble.

    Scale shape: explode -> per-doc sum with map-side combine; the shuffle
    carries one (doc, partial-sum) per task, never tokens. Zero Python.
    """
    from impalatogo_spark.operators import split_words

    words = split_words(df.select("doc_id", F.col(text_col)),
                        text_col=text_col, out="w")
    wt = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("long") % 101
        - 50
    )
    per = words.select("doc_id", F.explode("w").alias("tok")).select(
        "doc_id", wt.alias("wt")
    )
    agg = per.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"), F.sum("wt").alias("score_int")
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "score_int",
        (F.col("score_int") >= 0).alias("keep"),
        (F.col("score_int") * 2 >= F.col("n_tokens")).alias("keep_strict"),
    ).orderBy("doc_id")


def classifier_scores_oracle() -> str:
    """DuckDB twin: identical md5-weight hashing (strpos hex polynomial —
    DuckDB has no conv())."""
    hex_poly = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(md5(tok), {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
s AS (SELECT doc_id, ({hex_poly}) % 101 - 50 AS wt FROM w)
SELECT doc_id, count(*) AS n_tokens, CAST(sum(wt) AS BIGINT) AS score_int,
       CAST(sum(wt) AS BIGINT) >= 0 AS keep,
       CAST(sum(wt) AS BIGINT) * 2 >= count(*) AS keep_strict
FROM s GROUP BY doc_id ORDER BY doc_id
"""


# -- BPE merge training ------------------------------------------------------

def bpe_word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-type frequency table (the classic BPE training input): one
    distributed groupBy over whitespace tokens; empty tokens dropped."""
    from impalatogo_spark.operators import split_words

    w = split_words(df.select(text_col), keep=(), out="wa").select(
        F.explode("wa").alias("w")
    )
    return (
        w.filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_pair_counts(wf: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts — the per-round
    reduction of BPE training. Shuffles (lhs, rhs, partial sum) with
    map-side combine; symbol arrays never leave their scan task."""
    pairs = wf.filter(F.size(syms_col) >= 2).select(
        # the size guard matters: sequence(0, -1) is DESCENDING in Spark,
        # so an unguarded single-symbol word would fabricate a bogus pair
        "freq",
        F.explode(
            F.expr(
                f"transform(sequence(0, size({syms_col}) - 2),"
                f" i -> struct({syms_col}[i] AS lhs, {syms_col}[i + 1] AS rhs))"
            )
        ).alias("p"),
    )
    return (
        pairs.select("freq", F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.sum("freq").alias("pair_count"))
    )


def _bpe_apply_merge(syms, lhs: str, rhs: str):
    """Greedy left-to-right non-overlapping merge of (lhs, rhs) -> lhs||rhs
    inside a symbol array, as an exact aggregate() fold: state is
    (out-array, pending-symbol); each input symbol either completes a merge
    with the pending one, or flushes it. Pure codegen — no UDF."""
    merged = F.lit(lhs + rhs)
    zero = F.struct(
        F.expr("CAST(array() AS array<string>)").alias("out"),
        F.lit(None).cast("string").alias("pending"),
    )

    def step(acc, s):
        return (
            F.when(
                acc["pending"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("pending")),
            )
            .when(
                (acc["pending"] == F.lit(lhs)) & (s == F.lit(rhs)),
                F.struct(
                    F.array_append(acc["out"], merged).alias("out"),
                    F.lit(None).cast("string").alias("pending"),
                ),
            )
            .otherwise(
                F.struct(
                    F.array_append(acc["out"], acc["pending"]).alias("out"),
                    s.alias("pending"),
                )
            )
        )

    def fin(acc):
        return F.when(acc["pending"].isNull(), acc["out"]).otherwise(
            F.array_append(acc["out"], acc["pending"])
        )

    return F.aggregate(syms, zero, step, fin)


def bpe_merges(df: DataFrame, text_col: str = "text",
               n_merges: int = 8) -> list[tuple[int, str, str, int]]:
    """BPE merge-table training (Sennrich-style, over word types):
    character-initial symbol sequences, n_merges rounds of
    count-pairs -> pick (max count, lexicographic tie-break) -> greedy
    merge application. Returns [(rank, lhs, rhs, pair_count)].

    Spark shape per round: ONE skinny pair-count shuffle (map-side
    combined) + a 1-row driver collect for the argmax + a scan-local fold
    to apply the merge; the symbol table is localCheckpoint'd per round
    (iterative-DataFrame rule — see dedup_clusters) so lineage stays flat
    and the fold result is materialized once, not re-derived per
    downstream lambda element. Rounds are O(n_merges) scans of the
    word-TYPE table (vocabulary-sized, not corpus-sized — the classic
    reason BPE trains on word frequencies)."""
    wf = bpe_word_freqs(df, text_col)
    cur = wf.select("w", "freq", F.split("w", "").alias("syms"))
    # LAZY checkpoints (r08, the CC one-job-per-round cut): the next
    # round's pair-count argmax scans the full symbol table anyway, so it
    # materializes the checkpoint as a side effect — one job per round
    # instead of an eager checkpoint job PLUS the argmax job.
    cur = cur.transform(lambda d: _ckpt(d, eager=False))
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        best = (
            bpe_pair_counts(cur)
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .first()
        )
        if best is None or best.pair_count < 2:
            break
        merges.append((r, best.lhs, best.rhs, best.pair_count))
        cur = cur.select(
            "w", "freq", _bpe_apply_merge(F.col("syms"), best.lhs, best.rhs).alias("syms")
        ).transform(lambda d: _ckpt(d, eager=False))
    return merges


def bpe_merges_reference(word_freqs: dict[str, int],
                         n_merges: int = 8) -> list[tuple[int, str, str, int]]:
    """Plain-Python BPE used as the exactness oracle in tests (the
    iterative fold is not expressible in one DuckDB statement — list_reduce
    cannot carry struct state in 1.0 — so the gate is implementation
    equivalence, like streaming_stateful_sessions)."""
    seqs: dict[tuple[str, ...], int] = {tuple(w): f for w, f in word_freqs.items()}
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, f in seqs.items():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((r, lhs, rhs, cnt))
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, f in seqs.items():
            out: list[str] = []
            pending: str | None = None
            for s in seq:
                if pending is None:
                    pending = s
                elif pending == lhs and s == rhs:
                    out.append(lhs + rhs)
                    pending = None
                else:
                    out.append(pending)
                    pending = s
            if pending is not None:
                out.append(pending)
            new_seqs[tuple(out)] = new_seqs.get(tuple(out), 0) + f
        seqs = new_seqs
    return merges


def bpe_encode(df: DataFrame, merges: list[tuple[int, str, str, int]],
               text_col: str = "text") -> DataFrame:
    """Apply a learned BPE merge table to the corpus: per document, words
    split to characters, then every merge applied IN RANK ORDER as a chain
    of pure-codegen aggregate() folds (greedy left-to-right each, exactly
    the trainer's application rule). Output: per-doc BPE token counts and
    the chars-per-token compression ratio — the tokenizer-cost estimate a
    data-mixing pipeline prices corpora with.

    Scale shape: zero shuffles before the final per-doc aggregation; the
    merge chain is 8 nested codegen folds over word arrays inside the scan
    stage. The merge table is bounded (vocab-sized) and arrives as plain
    literals, never a join."""
    from impalatogo_spark.operators import split_words

    wa = split_words(df.select("doc_id", text_col), keep=("doc_id",), out="wa")
    words = wa.select("doc_id", F.explode("wa").alias("w")).filter(F.col("w") != "")
    # tokenization is a function of the word TYPE, not the token: run the
    # (interpreted-HOF) merge-fold chain once per distinct word and
    # broadcast the tiny (word -> n_tokens) table back over the per-doc
    # counts — the encode-side twin of training on word frequencies.
    # Fold work drops from O(corpus tokens) to O(|vocab|).
    syms = F.split(F.col("w"), "")
    for _, lhs, rhs, _cnt in sorted(merges):
        syms = _bpe_apply_merge(syms, lhs, rhs)
    types = (
        words.groupBy("w").agg(F.count(F.lit(1)).alias("__unused")).select("w")
        .select(
            "w",
            F.length("w").alias("n_chars_w"),
            F.size(syms).alias("n_tokens_w"),
        )
    )
    per_doc_word = words.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_doc_word.join(F.broadcast(types), "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("n_chars_w")).alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_tokens_w")).alias("n_bpe_tokens"),
            F.round(
                F.sum(F.col("cnt") * F.col("n_chars_w"))
                * 1.0
                / F.sum(F.col("cnt") * F.col("n_tokens_w")),
                6,
            ).alias("chars_per_token"),
        )
    )


# ---------------------------------------------------------------------------
# Fill-in-the-middle (FIM) transform (Bavarian et al. 2022, "Efficient
# Training of Language Models to Fill in the Middle"): split each document
# into (prefix, middle, suffix) at deterministic points and re-emit in PSM
# order so a causal LM learns infilling. Reference has no analogue; this is
# a training-data-pipeline op over the documents table.
# ---------------------------------------------------------------------------

FIM_SEP = "<|fim|>"


def fim_transform(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PSM fill-in-the-middle transform with hash-deterministic cut points.

    Cut points derive from pure integer arithmetic on doc_id (Knuth
    multiplicative constants mod large primes) so both engines agree
    bit-for-bit — no float, no RNG. For an n-word document, 0 <= a <= b <= n:
    prefix = words[1..a], middle = words[a+1..b], suffix = words[b+1..n];
    emitted as md5(prefix || SEP || suffix || SEP || middle) plus exact
    integer cut/length columns.

    Scale shape: zero shuffles — one scan, all codegen (split is
    materialized once behind the split_words Generate barrier; slices and
    md5 are per-row column expressions). The presentation orderBy is the
    only exchange. At 100 TB this is a pure map pass, the ideal shape.
    """
    from impalatogo_spark.operators import split_words

    w = F.col("__w")
    base = split_words(df.select("doc_id", text_col), text_col=text_col).select(
        "doc_id",
        "__w",
        F.size(w).cast("long").alias("n_words"),
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(1000003)).alias("h1"),
        ((F.col("doc_id") * F.lit(40503) + F.lit(2531011)) % F.lit(999983)).alias(
            "h2"
        ),
    )
    a = F.col("h1") % (F.col("n_words") + 1)
    cut = base.select(
        "doc_id",
        "__w",
        "n_words",
        a.alias("cut_a"),
        (a + (F.col("h2") % (F.col("n_words") - a + 1))).alias("cut_b"),
    )
    p = F.concat_ws(" ", F.slice(w, 1, F.col("cut_a").cast("int")))
    mid = F.concat_ws(
        " ",
        F.slice(
            w,
            (F.col("cut_a") + 1).cast("int"),
            (F.col("cut_b") - F.col("cut_a")).cast("int"),
        ),
    )
    s = F.concat_ws(
        " ",
        F.slice(
            w,
            (F.col("cut_b") + 1).cast("int"),
            (F.col("n_words") - F.col("cut_b")).cast("int"),
        ),
    )
    return (
        cut.select(
            "doc_id",
            "n_words",
            "cut_a",
            "cut_b",
            F.length(p).alias("p_len"),
            F.length(mid).alias("m_len"),
            F.length(s).alias("s_len"),
            F.md5(F.concat(p, F.lit(FIM_SEP), s, F.lit(FIM_SEP), mid)).alias(
                "psm_md5"
            ),
        )
        .orderBy("doc_id")
    )


def fim_transform_oracle() -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
cuts AS (
  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n,
         (doc_id * 2654435761) % 1000003 AS h1,
         (doc_id * 40503 + 2531011) % 999983 AS h2
  FROM w),
pts AS (
  SELECT doc_id, w, n, h1 % (n + 1) AS a,
         (h1 % (n + 1)) + (h2 % (n - (h1 % (n + 1)) + 1)) AS b
  FROM cuts),
parts AS (
  SELECT doc_id, n, a, b,
         -- DuckDB yields NULL (not []) for an empty-range slice; Spark's
         -- slice gives [] -> '' after concat_ws, so coalesce to match
         coalesce(array_to_string(w[1:a], ' '), '') AS p,
         coalesce(array_to_string(w[(a+1):b], ' '), '') AS m,
         coalesce(array_to_string(w[(b+1):n], ' '), '') AS s
  FROM pts)
SELECT doc_id, n AS n_words, a AS cut_a, b AS cut_b,
       length(p) AS p_len, length(m) AS m_len, length(s) AS s_len,
       md5(p || '{FIM_SEP}' || s || '{FIM_SEP}' || m) AS psm_md5
FROM parts ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# BM25 document retrieval (Robertson/Sparck-Jones; the classic bag-of-words
# ranking function). Reference has no retrieval op; this is the corpus-side
# scoring pass a training pipeline runs for query-targeted data selection.
# ---------------------------------------------------------------------------

BM25_TERMS = ("scan", "join", "window")


def bm25_topk(df: DataFrame, text_col: str = "text",
              terms: tuple[str, ...] = BM25_TERMS, k: int = 20) -> DataFrame:
    """BM25 top-k retrieval for a fixed term set (k1=1.2, b=0.75).

    Determinism: the per-(doc, term) BM25 contribution is rounded to integer
    ten-thousandths (the money-cents pattern) BEFORE the per-doc sum, so
    ranking and the final score are integer-exact across engines; only the
    single ln() call relies on correctly-rounded libm (same as tfidf).

    Scale shape: doc lengths and term frequencies are map-side-combined
    groupBys on the same exploded words frame (one scan); df and the
    (N, sum_dl) stats are tiny and BROADCAST; the tf-dl join shuffles only
    matched docs; top-k is TakeOrderedAndProject (no global window) with
    rank assigned over the k survivors."""
    from pyspark.sql import Window as W

    from impalatogo_spark.operators import split_words

    wdf = split_words(df.select("doc_id", text_col), text_col=text_col)
    words = wdf.select("doc_id", F.explode("__w").alias("term"))
    dl = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl"))
    tf = (
        words.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2
                    * (
                        (1 - 0.75)
                        + 0.75
                        * F.col("dl")
                        / (F.col("sum_dl") * 1.0 / F.col("n"))
                    )
                )
                * 10000.0
            )
            .cast("long")
            .alias("s4"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"), F.sum("s4").alias("s4")
    )
    top = agg.orderBy(F.desc("s4"), F.asc("doc_id")).limit(k)
    # constant-but-non-foldable partition key (s4 % 1 == 0): ranking runs
    # on the k-row TopN result only; the key keeps WindowExec's
    # single-partition warning out of logs (a bare lit gets pruned)
    wspec = W.partitionBy(F.col("s4") % F.lit(1)).orderBy(
        F.desc("s4"), F.asc("doc_id")
    )
    return (
        top.withColumn("rnk", F.row_number().over(wspec))
        .select(
            "doc_id",
            "n_terms",
            F.round(F.col("s4") / 10000.0, 4).alias("score"),
            "rnk",
        )
        .orderBy("rnk")
    )


def bm25_topk_oracle(terms: tuple[str, ...] = BM25_TERMS, k: int = 20) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM w GROUP BY 1),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM w
       WHERE term IN ({tlist}) GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         CAST(round(ln(1.0 + (n - df + 0.5) / (df + 0.5))
              * (tf * 2.2)
              / (tf + 1.2 * ((1 - 0.75) + 0.75 * dl / (sum_dl * 1.0 / n)))
              * 10000.0) AS BIGINT) AS s4
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(s4) AS BIGINT) AS s4
        FROM scored GROUP BY 1),
ranked AS (SELECT doc_id, n_terms, round(s4 / 10000.0, 4) AS score,
                  row_number() OVER (ORDER BY s4 DESC, doc_id) AS rnk
           FROM agg)
SELECT doc_id, n_terms, score, rnk FROM ranked WHERE rnk <= {k}
"""


def span_corruption(df: DataFrame, text_col: str = "text",
                    min_words: int = 8) -> DataFrame:
    """T5-style span corruption with hash-deterministic spans.

    Two non-overlapping spans (one per document half) are cut from the
    word sequence and replaced by sentinel tokens; the target sequence is
    the sentinel-delimited concatenation of the removed spans — the
    denoising-pretraining transform (public: Raffel et al. 2020), the
    masked twin of fim_transform. Span starts/lengths derive from pure
    integer arithmetic on doc_id (Knuth multiplicative constants mod
    large primes): no float, no RNG, bit-identical across engines.

    Layout for an n-word doc (n >= min_words, n2 = n div 2):
      len1 = 1 + h2 % 3;  a1 = 1 + h1 % (n2 - len1)        (first half)
      len2 = 1 + h1 % 3;  a2 = n2 + 1 + h3 % (n - n2 - len2 + 1)
    corrupted = w[1..a1-1] <x> w[a1+len1..a2-1] <y> w[a2+len2..n]
    targets   = <x> span1 <y> span2 <z>

    Pieces assemble as ARRAY concat then array_join — concat_ws keeps
    empty strings (phantom separators when a span touches a boundary),
    array concat drops empty slices identically in both engines.

    Scale shape: zero shuffles — one scan, codegen slices + md5 per row
    behind the split_words Generate barrier; the presentation orderBy is
    the only exchange."""
    from impalatogo_spark.operators import split_words

    w = F.col("__w")
    base = (
        split_words(df.select("doc_id", text_col), text_col=text_col)
        .select(
            "doc_id", "__w",
            F.size(w).cast("long").alias("n"),
            ((F.col("doc_id") * F.lit(2654435761)) % F.lit(1000003)).alias("h1"),
            ((F.col("doc_id") * F.lit(40503) + F.lit(2531011)) % F.lit(999983))
            .alias("h2"),
            ((F.col("doc_id") * F.lit(69069) + F.lit(12345)) % F.lit(999979))
            .alias("h3"),
        )
        .filter(F.col("n") >= min_words)
    )
    n, n2 = F.col("n"), F.expr("n DIV 2")
    len1 = (F.col("h2") % 3 + 1).alias("len1")
    cut = base.select(
        "doc_id", "__w", "n",
        len1,
        (F.col("h1") % 3 + 1).alias("len2"),
        (F.col("h1") % (n2 - (F.col("h2") % 3 + 1)) + 1).alias("a1"),
        (n2 + 1 + F.col("h3") % (n - n2 - (F.col("h1") % 3 + 1) + 1)).alias("a2"),
    )
    i = lambda c: c.cast("int")
    s1 = F.slice(w, 1, i(F.col("a1") - 1))
    s2 = F.slice(w, i(F.col("a1") + F.col("len1")),
                 i(F.col("a2") - F.col("a1") - F.col("len1")))
    s3 = F.slice(w, i(F.col("a2") + F.col("len2")),
                 i(F.col("n") - F.col("a2") - F.col("len2") + 1))
    sp1 = F.slice(w, i(F.col("a1")), i(F.col("len1")))
    sp2 = F.slice(w, i(F.col("a2")), i(F.col("len2")))
    sent = lambda s: F.array(F.lit(s))
    corrupted = F.array_join(
        F.concat(s1, sent("<extra_id_0>"), s2, sent("<extra_id_1>"), s3), " "
    )
    targets = F.array_join(
        F.concat(sent("<extra_id_0>"), sp1, sent("<extra_id_1>"), sp2,
                 sent("<extra_id_2>")), " "
    )
    return cut.select(
        "doc_id",
        F.col("n").alias("n_words"),
        F.col("a1").cast("long").alias("a1"),
        F.col("len1").cast("long").alias("len1"),
        F.col("a2").cast("long").alias("a2"),
        F.col("len2").cast("long").alias("len2"),
        (F.col("n") - F.col("len1") - F.col("len2") + 2)
        .cast("long").alias("n_corrupted"),
        F.md5(corrupted).alias("corrupted_md5"),
        F.md5(targets).alias("targets_md5"),
    ).orderBy("doc_id")


def span_corruption_oracle(min_words: int = 8) -> str:
    """DuckDB twin of span_corruption (list_slice is begin/end-inclusive
    vs Spark slice's start/length — converted below)."""
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS wl,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         (doc_id * 2654435761) % 1000003 AS h1,
         (doc_id * 40503 + 2531011) % 999983 AS h2,
         (doc_id * 69069 + 12345) % 999979 AS h3
  FROM documents
), cut AS (
  SELECT doc_id, wl, n,
         h2 % 3 + 1 AS len1,
         h1 % 3 + 1 AS len2,
         h1 % ((n // 2) - (h2 % 3 + 1)) + 1 AS a1,
         (n // 2) + 1 + h3 % (n - (n // 2) - (h1 % 3 + 1) + 1) AS a2
  FROM base WHERE n >= {min_words}
)
SELECT doc_id,
       n AS n_words,
       CAST(a1 AS BIGINT) AS a1, CAST(len1 AS BIGINT) AS len1,
       CAST(a2 AS BIGINT) AS a2, CAST(len2 AS BIGINT) AS len2,
       CAST(n - len1 - len2 + 2 AS BIGINT) AS n_corrupted,
       md5(array_to_string(
         list_concat(list_concat(list_concat(list_concat(
           list_slice(wl, 1, a1 - 1), ['<extra_id_0>']),
           list_slice(wl, a1 + len1, a2 - 1)), ['<extra_id_1>']),
           list_slice(wl, a2 + len2, n)), ' ')) AS corrupted_md5,
       md5(array_to_string(
         list_concat(list_concat(list_concat(list_concat(
           ['<extra_id_0>'], list_slice(wl, a1, a1 + len1 - 1)),
           ['<extra_id_1>']), list_slice(wl, a2, a2 + len2 - 1)),
           ['<extra_id_2>']), ' ')) AS targets_md5
FROM cut ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
# local document-fingerprinting algorithm, public)
# ---------------------------------------------------------------------------

WINNOW_B = 131            # Rabin-Karp polynomial base
WINNOW_M = 1_000_000_007  # modulus (products stay far under 2^63)


def winnow_fingerprints(df: DataFrame, k: int = 5, w: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Rolling-hash document fingerprints with winnowing: every k-gram of
    the text gets the Rabin-Karp polynomial hash
    sum_j code(c[i+j]) * B^(k-1-j) mod M, then each sliding window of w
    consecutive gram hashes contributes its MINIMUM — the winnowing
    guarantee that any match of length >= w+k-1 shares a fingerprint,
    with O(n/w) fingerprints per document. Returns the per-document
    summary (gram count, distinct fingerprint count, min/max/sum of the
    distinct fingerprint set — all exact integers).

    The reference brief's 'document fingerprinting (rolling hash)'
    operator: in SQL the rolling RECURRENCE is replaced by the direct
    per-position polynomial (same values, embarrassingly parallel — the
    recurrence is a serial optimization that a columnar engine neither
    needs nor wants). Scale shape: the whole summary is a PURE PER-ROW
    function of `text` — gram hashes, w-window minima, distinct set and
    its stats are all array expressions on the document row — so the only
    exchange in the plan is the final presentation ORDER BY over one
    summary row per document. Zero data-sized shuffle (the prior form
    exploded one row per gram and shuffled ~10x the corpus text bytes
    through a doc_id window; same contract, same oracle)."""
    from impalatogo_spark.operators.scale import parallelize_small_scan

    pows = [WINNOW_B ** (k - 1 - j) for j in range(k)]
    # code-point array materialized ONCE per doc behind a Generate barrier:
    # substr(text, i, 1) inside the per-position lambda is O(i) on UTF-8
    # strings (byte scan), which makes the naive form QUADRATIC in doc
    # length; element_at on a concrete int array is O(1), keeping the whole
    # hash pass linear. The barrier also stops CollapseProject from
    # re-inlining the split into every element access (CLAUDE.md rule).
    # parallelize_small_scan: the per-row kernel is CPU-bound interpreted
    # HOF evaluation — an under-split corpus must not run it on one core
    # (no-op at real scale where the scan is already wide).
    chars = parallelize_small_scan(df.select(id_col, text_col)).select(
        id_col,
        F.explode(F.array(F.expr(
            f"transform(split({text_col}, ''), c -> ascii(c))"
        ))).alias("arr"),
    )
    poly = " + ".join(
        f"element_at(arr, i + {j}) * {pows[j]}L" for j in range(k)
    )
    # gram-hash array behind its OWN Generate barrier: the sliding-minimum
    # transform below reads `h` w times per window position, and an inlined
    # projection would re-evaluate the whole polynomial map per element
    # (the CollapseProject rule again) — a concrete attribute keeps the
    # minima pass O(n*w).
    grams = chars.select(
        id_col,
        F.explode(F.array(F.expr(
            f"CASE WHEN size(arr) >= {k} THEN "
            f"transform(sequence(1, size(arr) - {k} + 1), "
            f"i -> ({poly}) % {WINNOW_M}) "
            "ELSE array() END"
        ))).alias("h"),
    )
    # docs with fewer than w grams yield no full window -> no fingerprints
    # (identical to the prior window-form's pos >= w-1 filter + inner join).
    # `fps` (the distinct fingerprint set) feeds four stats, so it too gets
    # a Generate barrier instead of re-running minima+distinct per stat.
    # least(element_at...) instead of array_min(slice(...)): the slice form
    # allocates a w-element array PER POSITION inside the interpreted
    # lambda; least() is w O(1) lookups with no allocation.
    window_min = "least(" + ", ".join(
        f"element_at(h, i - {j})" for j in range(w)) + ")" \
        if w > 1 else "element_at(h, i)"
    fps = grams.filter(F.expr(f"size(h) >= {w}")).select(
        id_col,
        F.col("h"),
        F.explode(F.array(F.expr(
            f"array_distinct(transform(sequence({w}, size(h)), "
            f"i -> {window_min}))"
        ))).alias("fps"),
    )
    return fps.select(
        id_col,
        F.expr("size(h)").cast("long").alias("n_grams"),
        F.expr("size(fps)").cast("long").alias("n_fingerprints"),
        F.expr("array_min(fps)").alias("fp_min"),
        F.expr("array_max(fps)").alias("fp_max"),
        F.expr("aggregate(fps, 0L, (a, x) -> a + x)").alias("fp_sum"),
    ).orderBy(id_col)


def winnow_oracle(k: int = 5, w: int = 4) -> str:
    """DuckDB twin of winnow_fingerprints (ord() == Spark ascii() on the
    same text; identical window frame and full-window filter)."""
    pows = [WINNOW_B ** (k - 1 - j) for j in range(k)]
    poly = " + ".join(
        f"CAST(ord(substr(text, CAST(gs.i + 1 + {j} AS INT), 1)) AS BIGINT)"
        f" * {pows[j]}"
        for j in range(k)
    )
    return f"""
WITH grams AS (
  SELECT doc_id, CAST(gs.i AS BIGINT) AS pos, ({poly}) % {WINNOW_M} AS h
  FROM documents, LATERAL (SELECT unnest(range(
    CASE WHEN length(text) >= {k} THEN length(text) - {k} + 1 ELSE 0 END))
    AS i) gs
),
picked AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id, pos,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)
               AS fp
    FROM grams
  ) WHERE pos >= {w - 1}
),
counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
           FROM grams GROUP BY doc_id)
SELECT p.doc_id, c.n_grams,
       CAST(count(*) AS BIGINT) AS n_fingerprints,
       CAST(min(fp) AS BIGINT) AS fp_min,
       CAST(max(fp) AS BIGINT) AS fp_max,
       CAST(sum(fp) AS BIGINT) AS fp_sum
FROM picked p JOIN counts c ON c.doc_id = p.doc_id
GROUP BY p.doc_id, c.n_grams
ORDER BY p.doc_id
"""
