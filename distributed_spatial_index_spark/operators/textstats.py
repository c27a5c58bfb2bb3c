"""Text-analysis pipeline ops over the documents table: token counting,
language-ID (stopword-marker heuristic), quality scoring, fingerprinting.

All pure column expressions (whole-stage codegen); every op has a DuckDB
oracle twin built from the same constants, with float expressions written
op-for-op identically so doubles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language marker words (toy n-gram/stopword heuristic; deterministic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "de", "es"],
    "fr": ["le", "la", "et", "est"],
    "de": ["der", "die", "und", "ist"],
}
STOPWORDS = ["the", "a", "an", "and", "or", "of", "is", "to", "in"]


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens): whitespace tokenization (space-delimited corpus)."""
    return docs.select(
        "doc_id", F.size(_tokens(F.col(text_col))).alias("n_tokens")
    )


def token_count_sql(table: str = "documents", text_col: str = "text") -> str:
    return (
        f"SELECT doc_id, CAST(len(string_split({text_col}, ' ')) AS INT) "
        f"AS n_tokens FROM {table}"
    )


def _marker_hits(text: Column, words: list[str]) -> Column:
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    hit = None
    for w in words:
        c = F.when(padded.contains(f" {w} "), 1).otherwise(0)
        hit = c if hit is None else hit + c
    return hit


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred): argmax of marker-word hits, ties -> lexicographic
    first language, no hits -> 'und'."""
    text = F.col(text_col)
    hits = {lang: _marker_hits(text, ws) for lang, ws in sorted(LANG_MARKERS.items())}
    best = None
    for lang, h in hits.items():
        best = h if best is None else F.greatest(best, h)
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return docs.select("doc_id", pred.alias("lang_pred"))


def lang_id_sql(table: str = "documents", text_col: str = "text") -> str:
    def hits(words: list[str]) -> str:
        return "(" + " + ".join(
            f"(CASE WHEN contains(' ' || {text_col} || ' ', ' {w} ') THEN 1 ELSE 0 END)"
            for w in words
        ) + ")"

    hs = {lang: hits(ws) for lang, ws in sorted(LANG_MARKERS.items())}
    best = "greatest(" + ", ".join(hs.values()) + ")"
    pred = "'und'"
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = (
            f"CASE WHEN {hs[lang]} = {best} AND {best} > 0 "
            f"THEN '{lang}' ELSE {pred} END"
        )
    return f"SELECT doc_id, {pred} AS lang_pred FROM {table}"


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, mean_token_len, quality): simple
    length/stopword heuristics.  Float ops ordered identically to the SQL
    twin -> bit-identical doubles."""
    text = F.col(text_col)
    toks = _tokens(text)
    n = F.size(toks)
    stop = _marker_hits(text, STOPWORDS)
    n_d = n.cast("double")
    stop_ratio = stop.cast("double") / n_d
    mean_len = (F.length(text) - (n - F.lit(1))).cast("double") / n_d
    quality = stop_ratio * F.lit(0.5) + (
        F.lit(1.0) / (F.lit(1.0) + F.abs(mean_len - F.lit(5.0)))
    ) * F.lit(0.5)
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        mean_len.alias("mean_token_len"),
        quality.alias("quality"),
    )


def quality_score_sql(table: str = "documents", text_col: str = "text") -> str:
    toks = f"string_split({text_col}, ' ')"
    n = f"len({toks})"
    stop = "(" + " + ".join(
        f"(CASE WHEN contains(' ' || {text_col} || ' ', ' {w} ') THEN 1 ELSE 0 END)"
        for w in STOPWORDS
    ) + ")"
    n_d = f"CAST({n} AS DOUBLE)"
    stop_ratio = f"(CAST({stop} AS DOUBLE) / {n_d})"
    mean_len = f"(CAST(length({text_col}) - ({n} - 1) AS DOUBLE) / {n_d})"
    quality = f"({stop_ratio} * 0.5 + (1.0 / (1.0 + abs({mean_len} - 5.0))) * 0.5)"
    return (
        f"SELECT doc_id, CAST({n} AS INT) AS n_tokens, {stop_ratio} AS stop_ratio, "
        f"{mean_len} AS mean_token_len, {quality} AS quality FROM {table}"
    )


def clean_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.35,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, lang_pred, n_tokens, quality): the standard corpus-prep
    composition — language filter + quality threshold + exact dedup
    (canonical doc per fingerprint group survives).  Everything stays
    JVM-side; the only shuffles are the dedup group-by and the semi-join
    back, both on well-distributed keys.  The point of this op is that the
    pipeline pieces COMPOSE declaratively: Catalyst fuses the three
    per-doc scans into one."""
    from distributed_spatial_index_spark.operators.dedup import dedup_exact

    lang = lang_id(docs, text_col)
    q = quality_score(docs, text_col)
    canon = dedup_exact(docs, text_col).filter(~F.col("is_duplicate"))
    return (
        lang.join(q, "doc_id")
        .filter(
            F.col("lang_pred").isin(*langs)
            & (F.col("quality") >= F.lit(min_quality))
        )
        .join(canon.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "lang_pred", "n_tokens", "quality")
    )


def clean_corpus_sql(
    table: str = "documents",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.35,
    text_col: str = "text",
) -> str:
    from distributed_spatial_index_spark.operators.dedup import dedup_exact_sql

    in_list = ", ".join(f"'{la}'" for la in langs)
    return f"""
        WITH lang AS ({lang_id_sql(table, text_col)}),
             q AS ({quality_score_sql(table, text_col)}),
             d AS ({dedup_exact_sql(table, text_col)})
        SELECT doc_id, lang_pred, n_tokens, quality
        FROM lang JOIN q USING (doc_id)
        WHERE lang_pred IN ({in_list}) AND quality >= {min_quality!r}
          AND doc_id IN (SELECT doc_id FROM d WHERE NOT is_duplicate)
    """


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp): md5 of the normalized text (lower + trim) — the exact
    dedup key."""
    return docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col(text_col)))).alias("fp")
    )


def fingerprint_sql(table: str = "documents", text_col: str = "text") -> str:
    return f"SELECT doc_id, md5(lower(trim({text_col}))) AS fp FROM {table}"


def top_terms(
    docs: DataFrame, k: int = 10, text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """(lang, token, n, rank): the k most frequent tokens per language —
    corpus vocabulary statistics for training-data analysis.  One shuffle
    for the (group, token) count (map-side combined), one for the per-group
    rank over the (small: distinct-token-sized) count table; ties broken by
    token so the result is deterministic."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(group_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), " ")).alias("token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy(group_col, "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(group_col).orderBy(F.desc("n"), F.col("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "token", "n", "rank")
    )


def top_terms_sql(
    table: str = "documents", k: int = 10, text_col: str = "text",
    group_col: str = "lang",
) -> str:
    return f"""
        SELECT {group_col}, token, n, rank FROM (
            SELECT {group_col}, token, CAST(count(*) AS BIGINT) AS n,
                   CAST(row_number() OVER (
                       PARTITION BY {group_col}
                       ORDER BY count(*) DESC, token
                   ) AS INT) AS rank
            FROM (
                SELECT {group_col},
                       unnest(string_split(lower(trim({text_col})), ' ')) AS token
                FROM {table}
            )
            WHERE token <> ''
            GROUP BY {group_col}, token
        ) WHERE rank <= {k}
    """
