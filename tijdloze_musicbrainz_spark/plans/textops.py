"""Text-analysis operators over ``documents`` — the LLM-pipeline text
tier of the brief: language-ID, quality scoring, token counting,
fingerprinting. All pure JVM column expressions (regex + arithmetic),
each with a DuckDB oracle. No reference twin (the reference's text
layer stops at search_key normalization, ``src/util.py:14-16``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .util import t

# Tiny per-language stopword lists for the n-gram-free heuristic
# language ID: score = #hits of language-specific common words. The
# testdata's lang column is the ground truth we evaluate against.
_STOPWORDS = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "es"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}


def _hits(words, lang: str):
    return F.size(
        F.filter(words, lambda w: w.isin(*_STOPWORDS[lang]))
    )


def _hits_sql(lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return f"len(list_filter(ws, w -> w IN ({inlist})))"


# ── the Gopher-style quality gate, single-sourced ────────────────────
# Five operators apply the same heuristic (text_quality_score,
# corpus_clean_pipeline, corpus_training_dataset_e2e,
# corpus_curation_scorecard, corpus_incremental_refresh_e2e); the
# thresholds, the punctuation class, and the Spark predicate live HERE
# so a tweak cannot silently decouple the nightly-job ledger from the
# scorecards. Oracle strings interpolate the same constants.
QUALITY_MIN_CHARS = 100
QUALITY_MAX_CHARS = 20000
QUALITY_MAX_PUNCT = 0.1
QUALITY_PUNCT_CLASS = "[a-z0-9 ]"


def quality_passes(text: str = "text"):
    """Boolean quality-gate expression over a text column: length
    window + punctuation ratio. NULL text yields NULL (fails filters
    and when() branches); empty text yields FALSE — the length gate
    ``n >= QUALITY_MIN_CHARS`` is false at n=0, and ``false AND NULL``
    is false under Spark's three-valued logic, so the nullif guard
    (which only protects the punct-ratio division from 0/0) never
    surfaces. Callers emitting the gate as an output COLUMN coalesce
    NULL to false themselves."""
    c = F.col(text)
    n = F.length(c)
    n_punct = F.length(F.regexp_replace(c, QUALITY_PUNCT_CLASS, ""))
    return (
        (n >= QUALITY_MIN_CHARS)
        & (n <= QUALITY_MAX_CHARS)
        & (n_punct.cast("double") / F.nullif(n, F.lit(0)) < QUALITY_MAX_PUNCT)
    )


@register(
    "text_token_stats",
    survey_ids=("F4", "F15"),
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_measured,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_ish_tokens,
       round(CAST(length(text) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS chars_per_token
FROM documents
""",
    doc="Token counting: whitespace tokens + a BPE-ish regex token "
    "count (letter runs / digit runs / single other), chars-per-token "
    "ratio — the standard pre-training corpus accounting pass.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    ws_tokens = F.size(F.split(F.col("text"), " "))
    bpe_ish = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_measured"),
        ws_tokens.cast("long").alias("n_ws_tokens"),
        bpe_ish.cast("long").alias("n_bpe_ish_tokens"),
        F.round(F.length("text").cast("double") / ws_tokens, 4).alias(
            "chars_per_token"
        ),
    )


@register(
    "text_quality_score",
    survey_ids=("F4", "F15", "P7"),
    oracle=f"""
WITH q AS (
  SELECT doc_id, lang, length(text) AS n,
         len(string_split(text, ' ')) AS n_tok,
         length(regexp_replace(text, '{QUALITY_PUNCT_CLASS}', '', 'g')) AS n_punct,
         len(list_filter(string_split(text, ' '),
             w -> w IN ('the', 'a', 'and', 'of', 'to'))) AS n_stop
  FROM documents
)
SELECT doc_id, lang,
       round(CAST(n_punct AS DOUBLE) / nullif(n, 0), 4) AS punct_ratio,
       round(CAST(n_stop AS DOUBLE) / n_tok, 4) AS stopword_ratio,
       (n >= {QUALITY_MIN_CHARS} AND n <= {QUALITY_MAX_CHARS}
        AND CAST(n_punct AS DOUBLE) / nullif(n, 0) < {QUALITY_MAX_PUNCT}) AS passes_quality
FROM q
""",
    doc="Quality scoring: length gate, punctuation ratio, stopword "
    "ratio — the Gopher-style heuristic filter stack as one "
    "projection.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n = F.length("text")
    n_tok = F.size(F.split(F.col("text"), " "))
    n_punct = F.length(F.regexp_replace(F.col("text"), "[a-z0-9 ]", ""))
    n_stop = F.size(
        F.filter(
            F.split(F.col("text"), " "),
            lambda w: w.isin("the", "a", "and", "of", "to"),
        )
    )
    # nullif: an empty document must yield NULL ratios, not an ANSI
    # divide-by-zero (edge-corpus test); n_tok is never 0 (split of ''
    # yields [''])
    punct_ratio = n_punct.cast("double") / F.nullif(n, F.lit(0))
    return docs.select(
        "doc_id",
        "lang",
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(n_stop.cast("double") / n_tok, 4).alias("stopword_ratio"),
        quality_passes().alias("passes_quality"),
    )


@register(
    "text_language_id",
    survey_ids=(),
    oracle=f"""
WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
scores AS (
  SELECT doc_id, lang,
         {_hits_sql('en')} AS s_en, {_hits_sql('de')} AS s_de,
         {_hits_sql('fr')} AS s_fr, {_hits_sql('es')} AS s_es,
         {_hits_sql('zh')} AS s_zh
  FROM w
)
SELECT doc_id, lang AS lang_actual,
       CASE greatest(s_en, s_de, s_fr, s_es, s_zh)
            WHEN s_en THEN 'en' WHEN s_de THEN 'de' WHEN s_fr THEN 'fr'
            WHEN s_es THEN 'es' ELSE 'zh' END AS lang_predicted,
       (CASE greatest(s_en, s_de, s_fr, s_es, s_zh)
            WHEN s_en THEN 'en' WHEN s_de THEN 'de' WHEN s_fr THEN 'fr'
            WHEN s_es THEN 'es' ELSE 'zh' END = lang) AS correct
FROM scores
""",
    doc="Heuristic language ID: per-language stopword-hit scores, "
    "argmax with a fixed precedence order (en>de>fr>es>zh on ties), "
    "evaluated against the lang ground-truth column.",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("ws")
    )
    langs = ["en", "de", "fr", "es", "zh"]
    scored = docs.select(
        "doc_id", "lang", *[_hits(F.col("ws"), lg).alias(f"s_{lg}") for lg in langs]
    )
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = F.when(F.col("s_en") == best, "en")
    for lg in langs[1:-1]:
        pred = pred.when(F.col(f"s_{lg}") == best, lg)
    pred = pred.otherwise("zh")
    return scored.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        pred.alias("lang_predicted"),
        (pred == F.col("lang")).alias("correct"),
    )


@register(
    "text_fingerprint",
    survey_ids=("F1",),
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id,
       CAST(list_reduce(
           list_transform(ws, t -> CAST(length(t) + 31 AS BIGINT)),
           (acc, x) -> (acc * x) % 1000000007) AS BIGINT) AS weak_shape_fp,
       array_to_string(list_slice(ws, 1, 3), ' ') AS head_key,
       array_to_string(list_slice(ws, greatest(len(ws)-2, 1), len(ws)), ' ') AS tail_key
FROM w
""",
    doc="Document fingerprinting: a rolling-hash-style shape "
    "fingerprint (product of token lengths mod large prime — "
    "engine-neutral arithmetic) plus head/tail keys, the cheap "
    "pre-cluster pass before shingle/minhash tiers.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    )
    # product of (len+31) mod p as a fold — small arrays, interpreted
    # lambda acceptable; engine-neutral unlike xxhash64.
    fp = F.aggregate(
        F.transform(F.col("ws"), lambda w: (F.length(w) + 31).cast("long")),
        F.lit(1).cast("long"),
        lambda acc, x: (acc * x) % 1_000_000_007,
    )
    # NULL text -> NULL keys: concat_ws would silently render a NULL
    # slice as '' while the oracle's array_to_string(NULL) stays NULL
    # (NULL-text edge-corpus row)
    null_s = F.lit(None).cast("string")
    return docs.select(
        "doc_id",
        fp.alias("weak_shape_fp"),
        F.when(F.col("ws").isNull(), null_s)
        .otherwise(F.concat_ws(" ", F.slice(F.col("ws"), 1, 3)))
        .alias("head_key"),
        F.when(F.col("ws").isNull(), null_s)
        .otherwise(
            F.expr("concat_ws(' ', slice(ws, greatest(size(ws)-2, 1), 3))")
        )
        .alias("tail_key"),
    )


@register(
    "corpus_clean_pipeline",
    survey_ids=("A1", "J9", "F4"),
    oracle="""
WITH base AS (
  SELECT doc_id, lang, text,
         length(text) AS n,
         len(string_split(text, ' ')) AS n_tok,
         length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
         string_split(text, ' ') AS ws
  FROM documents
),
quality AS (
  SELECT * FROM base
  WHERE n >= 100 AND n <= 20000 AND CAST(n_punct AS DOUBLE) / n < 0.1
),
exact_canon AS (
  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(lower(trim(text)))
),
survivors AS (
  SELECT q.* FROM quality q JOIN exact_canon e ON q.doc_id = e.doc_id
),
sh AS (
  SELECT doc_id, lang, n_tok,
         array_to_string(list_slice(ws, 1, 5), ' ') AS blk,
         list_distinct(list_transform(
           range(1, greatest(len(ws)-2, 1)+1),
           i -> array_to_string(list_slice(ws, i, i+2), ' '))) AS sgs
  FROM survivors
),
near_dup_losers AS (
  SELECT DISTINCT b.doc_id
  FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sgs, b.sgs)) * 1.0
        / len(list_distinct(list_concat(a.sgs, b.sgs))) >= 0.9
),
clean AS (
  SELECT s.* FROM sh s LEFT JOIN near_dup_losers l ON s.doc_id = l.doc_id
  WHERE l.doc_id IS NULL
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM clean GROUP BY lang
""",
    doc="The training-data pipeline composed end to end as ONE plan: "
    "quality gate (length + punctuation ratio) -> exact dedup "
    "(first-writer-wins) -> near-dup removal (blocked 3-shingle "
    "Jaccard >= 0.9, keep the lower doc_id) -> per-language doc and "
    "token accounting. Each tier is the cheap pre-filter for the next "
    "(gates before dedup before pairwise) — the ordering that keeps "
    "the expensive stages small at 100 TB.",
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import jaccard, shingles_col, words_col  # noqa: PLC0415

    docs = t(spark, sf_dir, "documents")
    quality = docs.filter(quality_passes()).select(
        "doc_id", "lang", "text", words_col().alias("ws")
    )

    # group by the DIGEST of the normalized text, not the text: the
    # dedup winner set needs only min(doc_id) per identical-text group,
    # so the exchange ships 16-byte md5 keys instead of whole documents
    # (at 100 TB the difference IS the shuffle; collision risk ~2^-64,
    # and the DuckDB twin groups by the same md5 so parity holds)
    exact_canon = quality.groupBy(
        F.md5(F.lower(F.trim(F.col("text")))).alias("k")
    ).agg(F.min("doc_id").alias("doc_id"))
    survivors = quality.join(exact_canon.select("doc_id"), "doc_id", "left_semi")

    # Materialize the gated+shingled table before the pair stage: it
    # feeds THREE plan branches (both self-join sides + the anti probe)
    # and Spark has no cross-join common-subexpression elimination, so
    # un-checkpointed it would re-run the gate/dedup/shingle subtree
    # per branch (the simhash fingerprint playbook; measured 2.0 s vs
    # 2.5 s at sf0.1). At 100 TB this is a staging write.
    sh = survivors.select(
        "doc_id",
        "lang",
        F.size("ws").alias("n_tok"),
        F.concat_ws(" ", F.slice(F.col("ws"), 1, 5)).alias("blk"),
        shingles_col(F.col("ws")).alias("sgs"),
    ).localCheckpoint()
    a = sh.alias("a")
    b = sh.alias("b")
    losers = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(jaccard(F.col("a.sgs"), F.col("b.sgs")) >= 0.9)
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    clean = sh.join(losers, "doc_id", "left_anti")
    return clean.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )


# -- corpus curation: deterministic sampling + stats rollup ----------

# per-10k keep rates by language stratum: downsample the dominant
# languages, keep the tail — the standard rebalancing move before
# training-data mixing
SAMPLE_RATE_BPS = {"en": 2000, "de": 5000, "fr": 5000, "es": 5000}
SAMPLE_RATE_DEFAULT_BPS = 10_000
_SAMPLE_MULT = 2654435761  # Knuth multiplicative-hash constant


@register(
    "corpus_sample_stratified",
    survey_ids=(),
    oracle=f"""
SELECT doc_id, lang,
       CAST((doc_id * {_SAMPLE_MULT}) % {2**31} % 10000 AS BIGINT) AS h
FROM documents
WHERE (doc_id * {_SAMPLE_MULT}) % {2**31} % 10000 <
      CASE lang
           WHEN 'en' THEN {SAMPLE_RATE_BPS["en"]}
           WHEN 'de' THEN {SAMPLE_RATE_BPS["de"]}
           WHEN 'fr' THEN {SAMPLE_RATE_BPS["fr"]}
           WHEN 'es' THEN {SAMPLE_RATE_BPS["es"]}
           ELSE {SAMPLE_RATE_DEFAULT_BPS} END
""",
    doc="Deterministic stratified sampling: per-language keep rates "
    "applied via an engine-neutral multiplicative hash of doc_id — "
    "NO rand(): a task retry, an AQE re-plan or a re-run yields the "
    "identical sample, which is what makes a 100 TB curation job "
    "reproducible. Pure map-side scan+filter (zero shuffles); the "
    "hash-bucket column rides along so downstream stages can "
    "sub-sample consistently (h < 1000 is a strict subset of "
    "h < 2000).",
)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    h = (
        (F.col("doc_id").cast("long") * F.lit(_SAMPLE_MULT).cast("long"))
        % F.lit(2**31).cast("long")
    ) % 10000
    rate = F.when(F.lit(False), F.lit(0))
    for lg, bps in SAMPLE_RATE_BPS.items():
        rate = rate.when(F.col("lang") == lg, bps)
    rate = rate.otherwise(SAMPLE_RATE_DEFAULT_BPS)
    return docs.select("doc_id", "lang", h.alias("h")).filter(F.col("h") < rate)


@register(
    "corpus_stats_rollup",
    survey_ids=(),
    oracle="""
SELECT lang,
       CAST(floor(length(text) / 500) * 500 AS BIGINT) AS len_band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY ROLLUP(lang, len_band)
""",
    doc="Corpus composition rollup: doc and token counts by "
    "(language, length band) with ROLLUP subtotals per language and a "
    "grand total — the one-pass grouping-sets aggregation a training-"
    "data dashboard reads instead of N separate groupBys (Spark "
    "computes all grouping sets in a single shuffle via the expand "
    "operator).",
)
def corpus_stats_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "lang",
        (F.floor(F.length("text") / 500) * 500).cast("long").alias("len_band"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    return docs.rollup("lang", "len_band").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )


# -- wide reporting + distribution profiling -------------------------

# The testdata's closed language set. PIVOT with EXPLICIT values is
# the scale-correct form: `.pivot(col)` without values runs an extra
# distinct-collect job over the full corpus first, and an unbounded
# value set would explode the schema; pinning the set keeps the pivot
# a single shuffle.
PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


@register(
    "text_pivot_source_lang",
    survey_ids=(),
    oracle="""
SELECT source,
       CAST(count(*) FILTER (WHERE lang = 'de') AS BIGINT) AS n_de,
       CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_en,
       CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS n_es,
       CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS n_fr,
       CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS n_zh,
       CAST(count(*) AS BIGINT) AS n_total
FROM documents
GROUP BY source
""",
    doc="PIVOT (long->wide conditional aggregation): per-source "
    "document counts with one column per language — the corpus-mix "
    "report a data-curation dashboard renders. Explicit pivot values "
    "(PIVOT_LANGS) matter at scale: Spark's values-less .pivot() "
    "first runs a distinct-collect JOB over the corpus to discover "
    "the columns — an extra full pass at 100 TB. The pivot itself is "
    "Spark's two-phase aggregate: partial count per (source, lang) "
    "map-side, then a pivotfirst re-group on source alone — the "
    "second exchange moves only the already-collapsed (source, lang) "
    "cardinality (~100 rows), not corpus data. Missing combinations "
    "are 0 (not NULL) on both engines.",
)
def text_pivot_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    wide = (
        docs.groupBy("source")
        .pivot("lang", list(PIVOT_LANGS))
        .agg(F.count(F.lit(1)))
    )
    total = sum((F.coalesce(F.col(lg), F.lit(0)) for lg in PIVOT_LANGS), F.lit(0))
    return wide.select(
        "source",
        *[
            F.coalesce(F.col(lg), F.lit(0)).cast("long").alias(f"n_{lg}")
            for lg in PIVOT_LANGS
        ],
        total.cast("long").alias("n_total"),
    )


TOPK_WORDS = 50


@register(
    "text_wordcount_topk",
    survey_ids=(),
    oracle=f"""
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word ASC
LIMIT {TOPK_WORDS}
""",
    doc="EXPLODE + global top-k: tokenize every document, count word "
    "frequencies, return the corpus-wide top 50 — the vocabulary / "
    "stopword profile pass of a tokenizer-training pipeline. The "
    "explode is generate-side (no materialized word table), the "
    "count is a map-side-combinable hash aggregate, and orderBy+ "
    "limit compiles to TakeOrderedAndProject: each partition keeps "
    "only its local top-k and the driver merges k*P rows — there is "
    "NO global sort of the vocabulary at any scale. Ties at the "
    "boundary are broken lexicographically so the result set is "
    "deterministic on both engines.",
)
def text_wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(TOPK_WORDS)
    )


@register(
    "text_length_percentiles",
    survey_ids=(),
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(n_chars, 0.50), 6) AS p50,
       round(quantile_cont(n_chars, 0.90), 6) AS p90,
       round(quantile_cont(n_chars, 0.99), 6) AS p99,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY lang
""",
    doc="EXACT interpolated percentiles per group (Spark "
    "F.percentile == DuckDB quantile_cont, both lo + frac*(hi-lo) "
    "over the sorted group): the length-distribution profile that "
    "drives percentile-based corpus cuts. Exact percentile holds the "
    "whole group's value multiset in the aggregation state, so it is "
    "the CALIBRATION-pass operator — run it on a stratified sample "
    "(corpus_sample_stratified) or a single profiling pass; the "
    "events_approx_sketches query carries the approx_percentile "
    "sketch twin that replaces it in the always-on 100 TB path "
    "(mergeable t-digest state, bounded memory).",
)
def text_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    pct = F.percentile(F.col("n_chars"), F.lit([0.50, 0.90, 0.99]))
    return docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(pct.getItem(0), 6).alias("p50"),
        F.round(pct.getItem(1), 6).alias("p90"),
        F.round(pct.getItem(2), 6).alias("p99"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


@register(
    "text_tfidf_top_terms",
    survey_ids=(),
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, count(*) AS tf
  FROM tok WHERE word <> '' GROUP BY doc_id, word
),
df AS (
  SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word
)
SELECT doc_id, word,
       CAST(rank_n AS BIGINT) AS rank_n,
       CAST(score_micro AS BIGINT) AS score_micro
FROM (
  SELECT tf.doc_id, tf.word,
         tf.tf * 1000000 // df.df AS score_micro,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * 1000000 // df.df DESC, tf.word ASC) AS rank_n
  FROM tf JOIN df ON tf.word = df.word
) WHERE rank_n <= 3
""",
    doc="TF-IDF-style distinguishing terms: per (doc, word) term "
    "frequency joined to corpus-wide document frequency, scored by "
    "the INTEGER rational floor(tf*1e6/df) — monotone in tf/df like "
    "tf x idf but exact on both engines (ln() differs in final ulps "
    "across libm implementations, which would flip rank ties "
    "non-deterministically; an integer score cannot). Top-3 terms "
    "per doc via row_number with a lexicographic tie-break. Plan "
    "shape at 100 TB: tf is a map-side-combinable hash aggregate "
    "over the exploded tokens, df aggregates the ALREADY-collapsed "
    "tf relation (vocabulary-sized, not token-volume), the tf-df "
    "join shuffles on word, and the per-doc top-3 window partitions "
    "on doc_id — high cardinality, no hot partition.",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    scored = tf.join(df, "word").select(
        "doc_id",
        "word",
        F.floor((F.col("tf") * F.lit(1_000_000)) / F.col("df"))
        .cast("long")
        .alias("score_micro"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("word")
    )
    return (
        scored.withColumn("rank_n", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_n") <= 3)
        .select("doc_id", "word", "rank_n", "score_micro")
    )


TOPK_BIGRAMS = 25


@register(
    "text_bigrams_topk",
    survey_ids=(),
    oracle=f"""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), w -> w <> '') AS t
  FROM documents
),
grams AS (
  SELECT unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM toks
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM grams
GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT {TOPK_BIGRAMS}
""",
    doc="Adjacent-bigram top-k over the corpus — the n-gram statistics "
    "pass of BPE-style tokenizer training (most frequent adjacent "
    "pair = the next merge candidate). The bigram array is built "
    "in-row with transform over an index sequence (no self-join of "
    "the exploded word table, which is the naive O(corpus^2-ish) "
    "formulation), then explode + hash-aggregate + "
    "TakeOrderedAndProject exactly like text_wordcount_topk.",
)
def text_bigrams_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    # sequence(0, n-2) pairs toks[i] with toks[i+1]; guard n < 2 —
    # Spark's sequence(0, -1) would generate a DESCENDING range.
    grams = F.when(F.size(toks) >= 2, F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1)),
    )).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(TOPK_BIGRAMS)
    )


# -- leakage-safe dataset splitting ----------------------------------

# Train/val/test boundaries in hash-percent space (out of 100).
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 90
# Engine-neutral FULL-STRING hash of the GROUP key (``source``):
# the first 8 hex chars of md5, decoded to an integer — splitting must
# be differential-testable or a silent engine skew contaminates eval
# sets. md5 covers the whole string (a positional-codepoint sample
# like the SimHash token base would deterministically collide
# same-prefix same-length source families, e.g. 'crawl-2024' vs
# 'crawl-2025' with the version past the sampled window, skewing the
# 80/10/10 bands arbitrarily). Spark decodes the prefix with conv();
# DuckDB lacks conv but casts '0x'-prefixed hex literals directly —
# parity is pinned by the differential oracle on every run.
_SOURCE_HASH_SPARK = "CAST(conv(substr(md5(source), 1, 8), 16, 10) AS BIGINT)"
_SOURCE_HASH_SQL = "CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT)"


@register(
    "corpus_split_train_val_test",
    survey_ids=(),
    oracle=f"""
SELECT doc_id, source,
       CASE WHEN ({_SOURCE_HASH_SQL}) % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN ({_SOURCE_HASH_SQL}) % 100 < {SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    doc="Leakage-safe train/val/test assignment: the split is decided "
    "by an engine-neutral hash of the GROUP key (source), not the "
    "row, so every document from one source lands in the same split "
    "— near-duplicates cluster within sources, and group-level "
    "hashing keeps them out of the eval sets (row-level splitting is "
    "the classic contamination bug). Deterministic (no rand(): task "
    "retries, AQE re-plans and re-runs agree), pure map-side "
    "scan+project with zero shuffles, and stable under corpus growth "
    "— adding documents never moves an existing source between "
    "splits, which row-count-based splitting cannot guarantee.",
)
def corpus_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    bucket = F.expr(_SOURCE_HASH_SPARK) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", "source", split.alias("split"))


# -- training-shard assignment by token budget -----------------------

SHARD_TOKEN_BUDGET = 2_000  # whitespace tokens per output shard


@register(
    "corpus_shard_by_token_budget",
    survey_ids=(),
    oracle=f"""
WITH sized AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
packed AS (
  SELECT doc_id, source, n_tok,
         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM sized
)
SELECT doc_id, source, n_tok,
       CAST(floor((cum_tok - 1) / {SHARD_TOKEN_BUDGET}) AS BIGINT)
         AS shard_in_source
FROM packed
""",
    doc="Training-shard assignment: documents are packed into output "
    "shards of ~SHARD_TOKEN_BUDGET whitespace tokens via a running "
    "token total in deterministic (doc_id) order, PER SOURCE — the "
    "writer-sharding step before a training job reads fixed-size "
    "files. The cumulative sum windows WITHIN each source partition "
    "(never a global single-partition window: source is the "
    "parallelism unit, so a 1000-executor run scales with the number "
    "of sources while each shard stays reproducible under retries). "
    "(cum_tok - 1) // budget makes a doc that exactly closes a "
    "budget stay in the current shard in both engines.",
)
def corpus_shard_by_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select("doc_id", "source", n_tok.alias("n_tok"))
    return sized.select(
        "doc_id",
        "source",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - 1) / SHARD_TOKEN_BUDGET)
        .cast("long")
        .alias("shard_in_source"),
    )


# -- the full training-dataset materialization, composed -------------


@register(
    "corpus_training_dataset_e2e",
    survey_ids=(),
    oracle=f"""
WITH base AS (
  SELECT doc_id, source, text,
         length(text) AS n,
         len(string_split(text, ' ')) AS n_tok,
         length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
         string_split(text, ' ') AS ws
  FROM documents
),
quality AS (
  SELECT * FROM base
  WHERE n >= 100 AND n <= 20000 AND CAST(n_punct AS DOUBLE) / n < 0.1
),
exact_canon AS (
  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(lower(trim(text)))
),
survivors AS (
  SELECT q.* FROM quality q JOIN exact_canon e ON q.doc_id = e.doc_id
),
sh AS (
  SELECT doc_id, source, n_tok,
         array_to_string(list_slice(ws, 1, 5), ' ') AS blk,
         list_distinct(list_transform(
           range(1, greatest(len(ws)-2, 1)+1),
           i -> array_to_string(list_slice(ws, i, i+2), ' '))) AS sgs
  FROM survivors
),
near_dup_losers AS (
  SELECT DISTINCT b.doc_id
  FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sgs, b.sgs)) * 1.0
        / len(list_distinct(list_concat(a.sgs, b.sgs))) >= 0.9
),
clean AS (
  SELECT s.doc_id, s.source, s.n_tok
  FROM sh s LEFT JOIN near_dup_losers l ON s.doc_id = l.doc_id
  WHERE l.doc_id IS NULL
),
split_assigned AS (
  SELECT doc_id, source, n_tok,
         CASE WHEN ({_SOURCE_HASH_SQL}) % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN ({_SOURCE_HASH_SQL}) % 100 < {SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM clean
),
sharded AS (
  SELECT split, source, n_tok,
         CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - 1)
                    / {SHARD_TOKEN_BUDGET}) AS BIGINT) AS shard_in_source
  FROM split_assigned
)
SELECT split, source, shard_in_source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM sharded
GROUP BY split, source, shard_in_source
""",
    doc="The COMPLETE training-dataset materialization as one Spark "
    "DAG: quality gate -> exact dedup (first-writer-wins) -> blocked "
    "near-dup removal -> leakage-safe split by group hash -> "
    "token-budget shard assignment -> per (split, source, shard) "
    "manifest (doc + token accounting). Composes the individually "
    "oracle-checked tiers in the cost-correct order (cheap gates "
    "shrink the corpus before the pairwise stage; the split hash and "
    "shard window run on the cleaned remnant only). The output IS the "
    "writer manifest: at 100 TB each (split, source, shard) row "
    "becomes one output file of ~budget tokens, written with "
    "partitionBy(split) so a training job reads its split by "
    "partition pruning alone.",
)
def corpus_training_dataset_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    from .dedup import jaccard, shingles_col, words_col  # noqa: PLC0415

    docs = t(spark, sf_dir, "documents")
    quality = docs.filter(quality_passes()).select(
        "doc_id", "source", "text", words_col().alias("ws")
    )

    # group by the DIGEST of the normalized text, not the text: the
    # dedup winner set needs only min(doc_id) per identical-text group,
    # so the exchange ships 16-byte md5 keys instead of whole documents
    # (at 100 TB the difference IS the shuffle; collision risk ~2^-64,
    # and the DuckDB twin groups by the same md5 so parity holds)
    exact_canon = quality.groupBy(
        F.md5(F.lower(F.trim(F.col("text")))).alias("k")
    ).agg(F.min("doc_id").alias("doc_id"))
    survivors = quality.join(exact_canon.select("doc_id"), "doc_id", "left_semi")

    # same three-branch reuse as corpus_clean_pipeline: checkpoint the
    # gated+shingled table once instead of recomputing it per branch
    sh = survivors.select(
        "doc_id",
        "source",
        F.size("ws").alias("n_tok"),
        F.concat_ws(" ", F.slice(F.col("ws"), 1, 5)).alias("blk"),
        shingles_col(F.col("ws")).alias("sgs"),
    ).localCheckpoint()
    a = sh.alias("a")
    b = sh.alias("b")
    losers = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(jaccard(F.col("a.sgs"), F.col("b.sgs")) >= 0.9)
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    clean = sh.join(losers, "doc_id", "left_anti").select(
        "doc_id", "source", "n_tok"
    )

    bucket = F.expr(_SOURCE_HASH_SPARK) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sharded = clean.select(
        split.alias("split"),
        "source",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - 1) / SHARD_TOKEN_BUDGET)
        .cast("long")
        .alias("shard_in_source"),
    )
    return sharded.groupBy("split", "source", "shard_in_source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )


# Oversampling epochs for the domain-mixing pass: high-quality sources
# are repeated, everything else passes through once. (The counterpart
# of corpus_sample_stratified's DOWN-sampling: a real mixture spec
# does both — e.g. Llama/GPT recipes repeat curated sources 2-5x.)
UPSAMPLE_EPOCHS = {"src0": 3, "src7": 2, "src13": 4}


@register(
    "corpus_domain_upsample",
    survey_ids=(),
    oracle=f"""
WITH spec AS (
  SELECT source, n_chars,
         CASE source
              WHEN 'src0' THEN {UPSAMPLE_EPOCHS["src0"]}
              WHEN 'src7' THEN {UPSAMPLE_EPOCHS["src7"]}
              WHEN 'src13' THEN {UPSAMPLE_EPOCHS["src13"]}
              ELSE 1 END AS epochs
  FROM documents
), expanded AS (
  SELECT source, n_chars, unnest(range(1, epochs + 1)) AS epoch
  FROM spec
)
SELECT source,
       CAST(count(DISTINCT epoch) AS BIGINT) AS n_epochs,
       CAST(count(*) AS BIGINT) AS n_rows_out,
       CAST(sum(n_chars) AS BIGINT) AS chars_out
FROM expanded
GROUP BY source
""",
    doc="Domain up-sampling for mixture construction: selected sources "
    "are repeated EPOCHS times via explode(sequence(1, epochs)) — row "
    "multiplication, the dual of corpus_sample_stratified's "
    "hash-filtered down-sampling. The epoch index rides along so a "
    "downstream shuffler can vary document order per epoch. Narrow "
    "map-side explode (no shuffle before the rollup); at 100 TB the "
    "multiplication happens inside the scan stage and never "
    "materializes the repeated corpus to a single node.",
)
def corpus_domain_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    epochs = F.when(F.lit(False), F.lit(1))
    for src, n in UPSAMPLE_EPOCHS.items():
        epochs = epochs.when(F.col("source") == src, n)
    epochs = epochs.otherwise(1)
    expanded = docs.select(
        "source",
        "n_chars",
        F.explode(F.sequence(F.lit(1), epochs)).alias("epoch"),
    )
    return expanded.groupBy("source").agg(
        F.countDistinct("epoch").cast("long").alias("n_epochs"),
        F.count("*").alias("n_rows_out"),
        F.sum("n_chars").cast("long").alias("chars_out"),
    )


@register(
    "w_ntile_quality_bins",
    survey_ids=("O1",),
    oracle="""
WITH scored AS (
  SELECT doc_id, lang,
         CAST(length(text) AS DOUBLE)
           / len(string_split(text, ' ')) AS awl
  FROM documents
), binned AS (
  SELECT lang, awl,
         ntile(10) OVER (PARTITION BY lang
                         ORDER BY awl, doc_id) AS decile
  FROM scored
)
SELECT lang, CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(min(awl), 6) AS min_awl,
       round(max(awl), 6) AS max_awl
FROM binned
GROUP BY lang, decile
""",
    doc="Curriculum quality-binning: exact per-language deciles of the "
    "average-word-length quality signal via ntile(10). (The synthetic "
    "corpus is lowercase+space only, so a punctuation ratio would be "
    "identically zero — mean word length is the signal with real "
    "variance here.) The ordering key (single-division double, doc_id "
    "tiebreak) is deterministic and bit-identical across engines. "
    "NOTE the deliberate trade-off: "
    "lang is a BOUNDED partition key, so at 100 TB this exact-ntile "
    "form funnels each language through one window partition — there "
    "the two-pass variant (per-lang approx-percentile thresholds "
    "computed once and broadcast, then a narrow-map width-bucket "
    "assignment) replaces it; this registered query pins the exact "
    "semantics the approximate path must approach.",
)
def w_ntile_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    docs = t(spark, sf_dir, "documents")
    awl = F.length("text").cast("double") / F.size(F.split(F.col("text"), " "))
    scored = docs.select("doc_id", "lang", awl.alias("awl"))
    w = Window.partitionBy("lang").orderBy("awl", "doc_id")
    return (
        scored.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy("lang", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.min("awl"), 6).alias("min_awl"),
            F.round(F.max("awl"), 6).alias("max_awl"),
        )
    )


@register(
    "w_quality_bins_scalable",
    survey_ids=(),
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       true AS ten_bins,
       true AS covers_all,
       true AS roughly_balanced
FROM documents
GROUP BY lang
""",
    doc="The SCALE PATH for quality binning (the two-pass variant "
    "w_ntile_quality_bins' docstring promises): pass 1 computes "
    "per-language decile thresholds with percentile_approx (fixed "
    "memory, mergeable partials — no total order, no single window "
    "partition per language); pass 2 broadcast-joins the ~#langs x 9 "
    "cut rows and assigns bins with an in-row F.aggregate over the "
    "cuts array. Bin boundaries are sketch-dependent, so — like "
    "events_approx_sketches — the differential contract is the "
    "PROPERTY, not the values: exactly 10 bins used, every doc "
    "assigned (bin counts sum to the per-lang total), and no bin "
    "holds more than 30% of a language (ideal 10%); the oracle pins "
    "those booleans true against the exact per-lang counts.",
)
def w_quality_bins_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    awl = F.length("text").cast("double") / F.size(F.split(F.col("text"), " "))
    scored = docs.select("lang", awl.alias("r"))
    cuts = scored.groupBy("lang").agg(
        F.percentile_approx(
            "r", F.array(*[F.lit(i / 10.0) for i in range(1, 10)]), 10_000
        ).alias("cuts")
    )
    binned = scored.join(F.broadcast(cuts), "lang").select(
        "lang",
        (
            1
            + F.aggregate(
                "cuts",
                F.lit(0),
                lambda acc, c: acc + F.when(F.col("r") > c, 1).otherwise(0),
            )
        ).alias("bin"),
    )
    per_bin = binned.groupBy("lang", "bin").agg(F.count("*").alias("n"))
    return per_bin.groupBy("lang").agg(
        F.sum("n").cast("long").alias("n_docs"),
        (F.countDistinct("bin") == 10).alias("ten_bins"),
        (F.sum("n") == F.sum("n")).alias("covers_all"),
        (F.max("n").cast("double") / F.sum("n") <= 0.30).alias("roughly_balanced"),
    )


@register(
    "text_bigram_lm_score",
    survey_ids=("A1", "J1", "F15"),
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, list_filter(string_split(text, ' '), w -> w <> '') AS tk
  FROM documents
), bg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(tk)),
                               i -> struct_pack(w1 := tk[i], w2 := tk[i + 1])))
           AS b
  FROM toks
), pairs AS (
  SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM bg
), c12 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM pairs GROUP BY w1, w2
), c1 AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS n1 FROM pairs GROUP BY w1
), vocab AS (
  SELECT CAST(count(DISTINCT w1) AS BIGINT) AS v FROM pairs
)
SELECT p.doc_id, p.lang,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(round(CAST(
             CAST(sum(CAST(round(ln(
                 CAST(c12.n12 + 1 AS DOUBLE) / (c1.n1 + vocab.v)
             ), 6) AS DECIMAL(25,6))) AS DOUBLE) / count(*)
           AS DECIMAL(25,12)), 6) AS DOUBLE) AS lm_score
FROM pairs p
JOIN c12 ON p.w1 = c12.w1 AND p.w2 = c12.w2
JOIN c1 ON p.w1 = c1.w1
CROSS JOIN vocab
GROUP BY p.doc_id, p.lang
""",
    doc="Bigram language-model scoring — the perplexity-filter shape "
    "(CCNet-style: score each document under a reference LM, filter "
    "or curriculum-order by score). The LM is add-1-smoothed word "
    "bigrams TRAINED ON THE CORPUS ITSELF in the same DAG (two "
    "aggregates), then broadcast back against the exploded bigram "
    "stream; the per-doc score is the mean log-probability. "
    "Cross-engine float discipline: P is a single division of exact "
    "integers (bit-identical), ln() may differ in the last ulp "
    "between libm and the JVM so each term is rounded to 6 dp BEFORE "
    "the exact-DECIMAL sum; the mean then divides identical values. "
    "At 100 TB the model stays ~|vocab|^2 rows — broadcastable for "
    "word-level vocabularies; for open vocabularies you shard the "
    "model join on w1 instead of broadcasting.",
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    toks = docs.select("doc_id", "lang", tk.alias("tk"))
    pairs = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 1),
                lambda i: F.struct(
                    F.col("tk")[i - 1].alias("w1"), F.col("tk")[i].alias("w2")
                ),
            )
        ).alias("b"),
    ).select("doc_id", "lang", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    # c1 (unigram-context counts) and |vocab| are MARGINALS of the
    # bigram table: n1 = sum_w2 n12, v = countDistinct(w1 in c12) —
    # deriving them from c12 instead of re-aggregating the exploded
    # pairs stream drops two full-corpus shuffles (and two re-runs of
    # the tokenize+explode lineage) down to aggregations over the
    # model-sized c12. The per-bigram smoothed log-prob term is then
    # folded INTO the model before broadcasting, so the corpus stream
    # is joined exactly once against one broadcast — identical values,
    # one explode-shuffle instead of three, one probe instead of three.
    c12 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    c1 = c12.groupBy(F.col("w1").alias("c1_w1")).agg(
        F.sum("n12").alias("n1")
    )
    vocab = c12.agg(F.countDistinct("w1").alias("v"))
    prob = (F.col("n12") + 1).cast("double") / (F.col("n1") + F.col("v"))
    model = (
        c12.join(c1, F.col("w1") == F.col("c1_w1"))
        .join(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(F.log(prob), 6).cast("decimal(25,6)").alias("term"),
        )
    )
    scored = pairs.join(F.broadcast(model), ["w1", "w2"]).select(
        "doc_id", "lang", "term"
    )
    # The mean's final rounding goes through decimal(25,12) on both
    # engines: round(double, 6) diverges at 1e-6 boundaries (Spark
    # rounds the decimal rendering HALF_UP, DuckDB the binary double;
    # doc 361 at sf0.1 split -3.388329 vs -3.38833 — caught by the r11
    # sf0.1 sweep). The quotient itself is bit-identical (exact-decimal
    # sum cast to double, divided by an exact count).
    return scored.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_bigrams"),
        F.round(
            (F.sum("term").cast("double") / F.count("*")).cast(
                "decimal(25,12)"
            ),
            6,
        )
        .cast("double")
        .alias("lm_score"),
    )


# Mixture planning: token budget per source GROUP. Groups partition the
# 20 sources by index parity-ish buckets (a stand-in for domain labels
# like web/books/code); budgets are the per-group token targets the
# mixture must not exceed.
MIXTURE_GROUP_BUDGET = {"grp0": 40_000, "grp1": 25_000, "grp2": 10_000}


@register(
    "corpus_mixture_plan",
    survey_ids=("A1", "F15"),
    oracle=f"""
WITH sized AS (
  SELECT source,
         'grp' || CAST(CAST(replace(source, 'src', '') AS BIGINT) % 3
                       AS VARCHAR) AS grp,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), per_source AS (
  SELECT source, grp,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS tokens_available
  FROM sized GROUP BY source, grp
), per_group AS (
  SELECT grp, CAST(sum(tokens_available) AS BIGINT) AS group_tokens
  FROM per_source GROUP BY grp
)
SELECT s.source, s.grp, s.n_docs, s.tokens_available,
       CAST(CASE s.grp
            WHEN 'grp0' THEN {MIXTURE_GROUP_BUDGET["grp0"]}
            WHEN 'grp1' THEN {MIXTURE_GROUP_BUDGET["grp1"]}
            ELSE {MIXTURE_GROUP_BUDGET["grp2"]} END AS BIGINT) AS group_budget,
       round(least(1.0, CAST(CASE s.grp
            WHEN 'grp0' THEN {MIXTURE_GROUP_BUDGET["grp0"]}
            WHEN 'grp1' THEN {MIXTURE_GROUP_BUDGET["grp1"]}
            ELSE {MIXTURE_GROUP_BUDGET["grp2"]} END AS DOUBLE)
            / g.group_tokens), 6) AS sample_rate,
       CAST(floor(s.tokens_available
            * least(1.0, CAST(CASE s.grp
                 WHEN 'grp0' THEN {MIXTURE_GROUP_BUDGET["grp0"]}
                 WHEN 'grp1' THEN {MIXTURE_GROUP_BUDGET["grp1"]}
                 ELSE {MIXTURE_GROUP_BUDGET["grp2"]} END AS DOUBLE)
                 / g.group_tokens)) AS BIGINT) AS tokens_planned
FROM per_source s JOIN per_group g ON s.grp = g.grp
""",
    doc="Mixture planning — the step BEFORE sampling in a real corpus "
    "build: given per-domain-group token budgets, compute each "
    "source's keep rate = min(1, budget / group_tokens) and the "
    "planned token yield. Two aggregates and a broadcast join of "
    "#groups rows; the rates feed corpus_sample_stratified's "
    "hash-filter and corpus_domain_upsample's epoch map. The rate is "
    "one division of exact integers (bit-identical), rounded once "
    "for display; tokens_planned floors the SAME unrounded double on "
    "both engines.",
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    grp = F.concat(
        F.lit("grp"),
        (F.replace(F.col("source"), F.lit("src"), F.lit("")).cast("long") % 3).cast(
            "string"
        ),
    )
    sized = docs.select(
        "source",
        grp.alias("grp"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    per_source = sized.groupBy("source", "grp").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("tokens_available"),
    )
    per_group = per_source.groupBy(F.col("grp").alias("g_grp")).agg(
        F.sum("tokens_available").alias("group_tokens")
    )
    budget = (
        F.when(F.col("grp") == "grp0", MIXTURE_GROUP_BUDGET["grp0"])
        .when(F.col("grp") == "grp1", MIXTURE_GROUP_BUDGET["grp1"])
        .otherwise(MIXTURE_GROUP_BUDGET["grp2"])
        .cast("long")
    )
    rate = F.least(
        F.lit(1.0), budget.cast("double") / F.col("group_tokens")
    )
    return (
        per_source.join(F.broadcast(per_group), F.col("grp") == F.col("g_grp"))
        .select(
            "source",
            "grp",
            "n_docs",
            "tokens_available",
            budget.alias("group_budget"),
            F.round(rate, 6).alias("sample_rate"),
            F.floor(F.col("tokens_available") * rate).cast("long").alias(
                "tokens_planned"
            ),
        )
    )


@register(
    "text_unpivot_metrics",
    survey_ids=("A1",),
    oracle="""
WITH wide AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(length(text)) AS BIGINT) AS total_chars,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
  FROM documents GROUP BY source
)
SELECT source, metric, value
FROM wide
UNPIVOT (value FOR metric IN (n_docs, total_chars, total_tokens))
""",
    doc="UNPIVOT — wide-to-long reshaping, the inverse of "
    "text_pivot_source_lang's pivot: per-source corpus metrics fold "
    "into (source, metric, value) rows for a generic metrics sink. "
    "Spark's DataFrame.unpivot compiles to an in-row Expand (3 output "
    "rows per input row, no shuffle beyond the feeding aggregate) — "
    "the long format is what a 100 TB pipeline's metrics store "
    "ingests regardless of how many metric columns the wide report "
    "grows.",
)
def text_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    wide = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias(
            "total_tokens"
        ),
    )
    return wide.unpivot(
        ids=["source"],
        values=["n_docs", "total_chars", "total_tokens"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# -- sequence packing into fixed token-budget training examples ------

# Next-fit packing: documents (in deterministic doc_id order, per
# source) accumulate into the current sequence while they fit; a doc
# that would overflow OPENS a new sequence — no doc ever straddles
# two sequences. This is the "sequence packing" step that turns a
# cleaned corpus into fixed-context training examples; it differs
# from corpus_shard_by_token_budget, whose floor(cumsum/budget)
# sharding lets a document straddle a shard boundary (fine for file
# sizing, wrong for training examples).
PACK_TOKEN_BUDGET = 256


def next_fit_bins(n, budget: int):
    """Next-fit packing kernel: bin ids for token counts ``n`` in
    order. O(#bins) numpy searchsorted calls on the cumsum — never a
    per-row Python loop. A doc larger than ``budget`` becomes an
    oversized singleton bin (it can never share). Unit-testable on its
    own because the testdata has no oversized docs to exercise that
    branch through the registered query.

    NOTE: the registered builder carries a NESTED copy of this kernel
    on purpose — a UDF closure referencing this module-level function
    pickles BY REFERENCE, and Python workers import by PYTHONPATH, not
    the driver's sys.path, so a driver launched outside the repo dies
    with ModuleNotFoundError (caught by the /verify recipe's fresh
    /tmp process). tests/test_dataset_assembly.py pins that the two
    copies agree."""
    import numpy as np  # noqa: PLC0415

    n = np.asarray(n, dtype=np.int64)
    cs = np.cumsum(n)
    bins = np.zeros(len(n), np.int64)
    start, bin_id, offset = 0, 0, 0
    while start < len(n):
        # widest prefix from `start` whose token sum fits the budget
        j = int(np.searchsorted(cs, offset + budget, side="right"))
        if j == start:  # single doc larger than the budget: own bin
            j = start + 1
        bins[start:j] = bin_id
        bin_id += 1
        offset = int(cs[j - 1])
        start = j
    return bins




@register(
    "corpus_pack_sequences",
    survey_ids=(),
    oracle=f"""
WITH RECURSIVE sized AS (
  SELECT doc_id, source,
         coalesce(CAST(len(list_filter(string_split(text, ' '),
                                       w -> w <> '')) AS BIGINT), 0) AS n_tok,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
pack AS (
  SELECT source, rn, doc_id, n_tok,
         CAST(0 AS BIGINT) AS seq_in_source, n_tok AS fill
  FROM sized WHERE rn = 1
  UNION ALL
  SELECT s.source, s.rn, s.doc_id, s.n_tok,
         CASE WHEN p.fill + s.n_tok <= {PACK_TOKEN_BUDGET}
              THEN p.seq_in_source ELSE p.seq_in_source + 1 END,
         CASE WHEN p.fill + s.n_tok <= {PACK_TOKEN_BUDGET}
              THEN p.fill + s.n_tok ELSE s.n_tok END
  FROM pack p JOIN sized s ON s.source = p.source AND s.rn = p.rn + 1
)
SELECT doc_id, source, n_tok, seq_in_source FROM pack
""",
    doc="Sequence packing (next-fit): greedy assignment of documents "
    "to fixed-token-budget training sequences, per source in "
    "deterministic doc_id order; an overflowing document always opens "
    "a new sequence, so no example mixes a split document. The fold "
    "is inherently sequential WITHIN a source (each break position "
    "depends on the previous one — the state is a break-position "
    "recurrence over the token cumsum, not an additive offset, so a "
    "parallel chunk+carry decomposition cannot reproduce it exactly). "
    "What CAN be bounded is memory: the Spark plan repartitions by "
    "source, sorts within partitions on (source, doc_id), and runs "
    "ONE STREAMING mapInPandas fold — Arrow batches arrive in order, "
    "the fold carries (open-bin id, fill, has-docs) per source across "
    "batch boundaries, and each batch folds with the same vectorized "
    "numpy-searchsorted loop. Peak executor memory is one Arrow "
    "batch (spark.sql.execution.arrow.maxRecordsPerBatch), NOT one "
    "source's whole (id, n_tok) frame — the r11 verdict's "
    "multi-billion-doc-source ceiling is gone while the output stays "
    "bit-identical (tests/test_dataset_assembly.py pins the streamed "
    "fold against the single-group fold, with forced tiny batches, "
    "zero-token docs and oversized docs at batch boundaries). "
    "Sources remain the parallelism unit, exactly like the shard "
    "assigner. The DuckDB twin is an independent formulation: a "
    "recursive CTE stepping one row_number at a time.",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split(F.col("text"), " "), lambda w: w != ""))
    # coalesce: a NULL document consumes zero budget (NULL n_tok would
    # poison the pandas int cast here and the fill fold in the oracle)
    sized = docs.select(
        "doc_id",
        "source",
        F.coalesce(n_tok.cast("long"), F.lit(0)).alias("n_tok"),
    )
    return pack_sequences_streamed(sized, PACK_TOKEN_BUDGET)


def pack_sequences_streamed(sized: DataFrame, budget: int) -> DataFrame:
    """Next-fit over (doc_id, source, n_tok) as a streaming fold:
    hash-partition by source (every source's rows land in one
    partition, whole sources never split), sort within partitions on
    (source, doc_id), then fold Arrow batch by Arrow batch carrying
    the open bin's (id, fill, has_docs) per source. Exact same bins
    as folding each source in one frame; peak memory one batch."""

    def pack_stream(batches):
        # self-contained closure (no module refs): workers launched
        # from a foreign cwd must unpickle it without this package
        import numpy as np  # noqa: PLC0415

        # source -> (next free bin id, open-bin fill, open-bin
        # has-docs). has_docs distinguishes a genuinely empty new bin
        # (an oversized doc must be FORCED into it) from an open bin
        # holding only zero-token docs (fill 0, but an oversized doc
        # must CLOSE it first — the single-frame fold's searchsorted
        # semantics).
        state: dict[str, tuple[int, int, bool]] = {}
        for pdf in batches:
            out = np.zeros(len(pdf), np.int64)
            srcs = pdf["source"].to_numpy()
            toks = pdf["n_tok"].to_numpy(np.int64)
            pos = 0
            while pos < len(pdf):
                src = srcs[pos]
                end = pos
                while end < len(pdf) and srcs[end] == src:
                    end += 1
                bin_id, fill, has_docs = state.get(src, (0, 0, False))
                n = toks[pos:end]
                # shifted coordinates: the open bin starts at 0 and
                # already holds `fill` tokens, so doc i's end position
                # is fill + local-cumsum[i]; a doc fits the bin that
                # starts at `off` while its end <= off + budget —
                # exactly the single-frame searchsorted condition
                cs = fill + np.cumsum(n)
                total = int(cs[-1]) if len(n) else fill
                bins = np.empty(len(n), np.int64)
                start, off, cur_has = 0, 0, has_docs
                while start < len(n):
                    j = int(np.searchsorted(cs, off + budget, side="right"))
                    if j == start:
                        if cur_has:
                            # the bin carried from the previous batch
                            # overflows at this doc: close it (its
                            # content ends where the carry ends) and
                            # retry against the fresh bin
                            bin_id += 1
                            off = fill if start == 0 else int(cs[start - 1])
                            cur_has = False
                            continue
                        # genuinely empty bin: force the oversized doc
                        j = start + 1
                    bins[start:j] = bin_id
                    cur_has = True
                    if j < len(n):
                        bin_id += 1
                        off = int(cs[j - 1])
                        cur_has = False
                    start = j
                # the bin holding the segment's last doc stays OPEN
                # across the batch boundary: carry its id, content
                # size, and non-emptiness
                state[src] = (bin_id, total - off, cur_has)
                out[pos:end] = bins
                pos = end
            pdf = pdf.copy()
            pdf["seq_in_source"] = out
            yield pdf

    return (
        sized.repartition("source")
        .sortWithinPartitions("source", "doc_id")
        .mapInPandas(
            pack_stream,
            schema="doc_id long, source string, n_tok long, seq_in_source long",
        )
    )


# -- overlapping chunking for embedding / retrieval pipelines --------

CHUNK_TOKENS = 64  # tokens per chunk
CHUNK_STRIDE = 48  # chunk start spacing => CHUNK_TOKENS - CHUNK_STRIDE overlap


@register(
    "corpus_chunk_overlap",
    survey_ids=(),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS tk
  FROM documents
),
sized AS (SELECT doc_id, tk, len(tk) AS n_tok FROM toks WHERE len(tk) > 0),
starts AS (
  SELECT doc_id, n_tok,
         unnest(range(0, CASE WHEN n_tok <= {CHUNK_TOKENS} THEN 1
                              ELSE CAST(ceil((n_tok - {CHUNK_TOKENS})
                                             / {CHUNK_STRIDE}.0) AS BIGINT) + 1
                         END)) AS chunk_id,
         tk
  FROM sized
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(least(n_tok - chunk_id * {CHUNK_STRIDE}, {CHUNK_TOKENS}) AS BIGINT)
         AS chunk_len,
       md5(array_to_string(list_slice(tk, chunk_id * {CHUNK_STRIDE} + 1,
                                      chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}),
                           ' ')) AS chunk_digest
FROM starts
""",
    doc="Overlapping chunking — the window step ahead of embedding / "
    "retrieval indexing: chunks of CHUNK_TOKENS tokens every "
    "CHUNK_STRIDE (16-token overlap), last chunk ragged, one chunk "
    "for short docs. Pure JVM in-row expansion (sequence + slice + "
    "posexplode) — no UDF, no shuffle at all: the plan is scan -> "
    "generate -> project, embarrassingly parallel at any corpus "
    "size. The md5 chunk digest makes the oracle verify the actual "
    "chunk TEXT, not just offsets.",
)
def corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    sized = (
        docs.select("doc_id", toks.alias("tk"))
        .withColumn("n_tok", F.size("tk"))
        .filter(F.col("n_tok") > 0)
    )
    n_chunks = F.when(F.col("n_tok") <= CHUNK_TOKENS, F.lit(1).cast("bigint")).otherwise(
        F.ceil((F.col("n_tok") - CHUNK_TOKENS) / F.lit(float(CHUNK_STRIDE))).cast(
            "bigint"
        )
        + 1
    )
    exploded = sized.select(
        "doc_id",
        "n_tok",
        "tk",
        F.posexplode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
            "chunk_id", "_start"
        ),
    )
    start = F.col("chunk_id").cast("bigint") * CHUNK_STRIDE
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.alias("start_tok"),
        F.least(F.col("n_tok") - start, F.lit(CHUNK_TOKENS)).cast("long").alias(
            "chunk_len"
        ),
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("tk"), (start + 1).cast("int"), CHUNK_TOKENS)
            )
        ).alias("chunk_digest"),
    )


# -- iterative BPE merge training -------------------------------------------

BPE_ROUNDS = 3


def _bpe_cte_parts() -> list[str]:
    """The shared CTE chain t0 -> t{BPE_ROUNDS}: train each round's
    winning pair and rewrite the corpus with it (greedy left-to-right,
    non-overlapping). Assembled by BOTH the trainer oracle (reads the
    winners) and the apply oracle (reads the rewritten corpus)."""
    parts = ["t0 AS (SELECT doc_id, list_filter(string_split(text, ' '), "
             "w -> w <> '') AS tk FROM documents)"]
    for r in range(1, BPE_ROUNDS + 1):
        prev = f"t{r - 1}"
        parts.append(f"""
pairs{r} AS (
  SELECT t.tk[u.i] AS a, t.tk[u.i + 1] AS b
  FROM {prev} t, unnest(range(1, len(t.tk))) AS u(i)
),
w{r} AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS cnt
  FROM pairs{r} GROUP BY a, b
  ORDER BY cnt DESC, a, b LIMIT 1
),
mpos{r} AS (
  SELECT doc_id, p FROM (
    SELECT doc_id, p, min(p) OVER (PARTITION BY doc_id, grp) AS rs
    FROM (
      SELECT t.doc_id, u.i AS p,
             u.i - row_number() OVER (
               PARTITION BY t.doc_id ORDER BY u.i) AS grp
      FROM {prev} t, unnest(range(1, len(t.tk))) AS u(i), w{r}
      WHERE t.tk[u.i] = w{r}.a AND t.tk[u.i + 1] = w{r}.b
    )
  ) WHERE (p - rs) % 2 = 0
),
kept{r} AS (
  SELECT doc_id, list(p ORDER BY p) AS ks FROM mpos{r} GROUP BY doc_id
),
t{r} AS (
  SELECT t.doc_id,
         CASE WHEN k.ks IS NULL THEN t.tk
         ELSE list_filter(list_transform(range(1, len(t.tk) + 1),
            i -> CASE WHEN list_contains(k.ks, i)
                      THEN t.tk[i] || t.tk[i + 1]
                      WHEN list_contains(k.ks, i - 1) THEN NULL
                      ELSE t.tk[i] END), x -> x IS NOT NULL)
         END AS tk
  FROM {prev} t LEFT JOIN kept{r} k USING (doc_id)
)""")
    return parts


def _bpe_oracle() -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, a AS token_a, b AS token_b, "
        f"cnt AS pair_count FROM w{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    return "WITH " + ",".join(_bpe_cte_parts()) + "\n" + unions


@register(
    "text_bpe_train_merges",
    survey_ids=(),
    oracle=_bpe_oracle(),
    doc=f"ITERATIVE BPE tokenizer training ({BPE_ROUNDS} unrolled merge "
    "rounds — the trainer loop behind every modern tokenizer, at "
    "word level): each round counts adjacent token pairs corpus-wide, "
    "elects the most frequent pair (lexicographic tie-break), and "
    "merges its non-overlapping occurrences GREEDY LEFT-TO-RIGHT "
    "before the next round re-counts over the rewritten corpus. The "
    "Spark side rewrites each document with an in-row struct-state "
    "fold (aggregate: carry + acc — zero shuffle for the merge "
    "itself; the only shuffles are the per-round pair counts), the "
    "winner is a 1-row min_by aggregate broadcast back (never "
    "collected); rounds chain LAZILY into one DAG. The oracle is an "
    "INDEPENDENT formulation: positions via unnest, greedy "
    "non-overlap via run-grouping window parity ((p - run_start) % 2 "
    "= 0), array rebuild via transform+filter — so the two engines "
    "agree on the subtle overlap semantics ('a a a' merges once), "
    "not just the easy counts. At 100 TB each round is one "
    "pair-count shuffle over the corpus; merges are narrow.",
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda w: w != "").alias("tk"),
    )
    winners, _ = _bpe_train_chain(docs)
    out = winners[0]
    for w in winners[1:]:
        out = out.unionByName(w)
    return out.filter(F.col("token_a").isNotNull())


def _bpe_train_chain(
    docs: DataFrame,
) -> tuple[list[DataFrame], DataFrame]:
    """(per-round winner frames, the corpus rewritten with all
    BPE_ROUNDS merges applied) — shared by the trainer query (reads
    the winners) and text_bpe_apply_merges (reads the rewrite).

    The head checkpoint fans the tokenized corpus out to cluster
    parallelism first (the single-row-group test scan otherwise runs
    EVERY round's pair-count and merge-fold as one task — each round's
    checkpoint inherits the partitioning of its input, so a 1-task
    head serializes the whole chain) and materializes it once, so
    round 1's two consumers (pair counts + rewrite) don't re-tokenize.
    fan_out is partition-count-gated: a no-op at production scale."""
    from .util import fan_out  # noqa: PLC0415

    docs = _round_checkpoint(fan_out(docs))
    merge_fold = F.expr(
        """
aggregate(tk,
  named_struct('acc', CAST(array() AS ARRAY<STRING>),
               'carry', CAST(NULL AS STRING)),
  (s, x) -> IF(s.carry IS NULL,
               named_struct('acc', s.acc, 'carry', x),
               IF(wa IS NOT NULL AND s.carry = wa AND x = wb,
                  named_struct('acc', array_append(s.acc, concat(wa, wb)),
                               'carry', CAST(NULL AS STRING)),
                  named_struct('acc', array_append(s.acc, s.carry),
                               'carry', x))),
  s -> IF(s.carry IS NULL, s.acc, array_append(s.acc, s.carry)))
"""
    )
    winners = []
    for r in range(1, BPE_ROUNDS + 1):
        pairs = docs.select(
            F.explode(
                F.when(
                    F.size("tk") >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size("tk") - 2),
                        lambda i: F.struct(
                            F.get(F.col("tk"), i).alias("a"),
                            F.get(F.col("tk"), i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("g")
        ).select("g.a", "g.b")
        counts = pairs.groupBy("a", "b").agg(F.count("*").alias("cnt"))
        # 1-row global winner: most frequent, then lexicographic —
        # min_by over (-cnt, a, b); empty corpus -> NULL winner row
        winner = counts.agg(
            F.min_by(
                F.struct("a", "b", "cnt"),
                F.struct((-F.col("cnt")).alias("nc"), "a", "b"),
            ).alias("w")
        ).select(
            F.col("w.a").alias("wa"),
            F.col("w.b").alias("wb"),
            F.col("w.cnt").alias("wcnt"),
        )
        winners.append(
            winner.select(
                F.lit(r).cast("long").alias("round"),
                F.col("wa").alias("token_a"),
                F.col("wb").alias("token_b"),
                F.col("wcnt").alias("pair_count"),
            )
        )
        docs = _round_checkpoint(
            docs.crossJoin(F.broadcast(winner))
            .select("doc_id", merge_fold.alias("tk"))
        )
    return winners, docs


def _round_checkpoint(df: DataFrame) -> DataFrame:
    """EAGER checkpoint per BPE round (r6, measured 6.6 -> 4.7 s at
    sf0.1 for the composed spans query): the lazy chain made every
    downstream action re-evaluate ALL prior rounds' interpreted merge
    folds (O(R^2) fold evaluations); the checkpoint caps it at O(R).
    eager=True per the r5 lesson — a lazy localCheckpoint still
    recomputes on first use.

    Executor-loss semantics (r8, SCALE.md): localCheckpoint blocks
    live on executor-local storage — on a real cluster an executor
    loss triggers recompute of prior rounds, never failure. When a
    RELIABLE checkpoint dir is configured
    (``sc.setCheckpointDir(...)``), rounds checkpoint to shared
    storage instead: loss-proof blocks at the cost of one distributed
    write per round. Shared with the graph plans via
    util.eager_checkpoint."""
    from .util import eager_checkpoint  # noqa: PLC0415

    return eager_checkpoint(df)


@register(
    "text_bpe_apply_merges",
    survey_ids=(),
    oracle=(
        "WITH "
        + ",".join(_bpe_cte_parts())
        + f"""
SELECT t0.doc_id,
       CAST(len(t0.tk) AS BIGINT) AS n_tok_raw,
       CAST(len(t{BPE_ROUNDS}.tk) AS BIGINT) AS n_tok_bpe,
       md5(coalesce(array_to_string(t{BPE_ROUNDS}.tk, ' '), ''))
         AS bpe_digest
FROM t0 JOIN t{BPE_ROUNDS} USING (doc_id)
WHERE t0.tk IS NOT NULL
"""
    ),
    doc=f"APPLYING the trained BPE merges (r6, VERDICT item 4 — the "
    "trainer's output now tokenizes, it is no longer write-only): the "
    f"{BPE_ROUNDS} learned merge rules re-tokenize every document "
    "greedy left-to-right, and the per-document token counts feed "
    "downstream sizing (sequence packing / chunking budgets). The "
    "bpe_digest hash certifies the actual MERGED TOKEN CONTENT of "
    "every document, not just counts — the oracle replays the merge "
    "application through its independent position/run-parity "
    "formulation, so both engines must agree on every merge site. "
    "NULL-text docs carry no tokens and are excluded on both engines. "
    "Spark plan: the same lazy chain as the trainer (one pair-count "
    "shuffle per round, broadcast winner, zero-shuffle in-row "
    "rewrite) plus one doc_id join against the raw token counts.",
)
def text_bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.filter(F.split(F.col("text"), " "), lambda w: w != "").alias("tk"),
        )
    )
    _, rewritten = _bpe_train_chain(docs)
    raw = docs.select("doc_id", F.size("tk").cast("long").alias("n_tok_raw"))
    return raw.join(rewritten, "doc_id").select(
        "doc_id",
        "n_tok_raw",
        F.size("tk").cast("long").alias("n_tok_bpe"),
        F.md5(F.concat_ws(" ", F.col("tk"))).alias("bpe_digest"),
    )


INVIDX_TOP_TOKENS = 50
INVIDX_SEGMENT = 100  # posting-segment cap: first N doc ids per token


@register(
    "text_inverted_index",
    survey_ids=("A1", "A7"),
    oracle=f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t.tk AS token
  FROM documents,
       unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS t(tk)
),
agg AS (
  SELECT token,
         CAST(count(*) AS BIGINT) AS df,
         array_to_string(
           list_slice(list(doc_id ORDER BY doc_id), 1, {INVIDX_SEGMENT}),
           ',') AS posting_segment
  FROM tok GROUP BY token
)
SELECT token, df, posting_segment FROM agg
QUALIFY row_number() OVER (ORDER BY df DESC, token) <= {INVIDX_TOP_TOKENS}
""",
    doc="INVERTED INDEX build — the IR-side artifact the BM25 query "
    "consumes conceptually, materialized: token -> document "
    "frequency + the first-{seg} posting SEGMENT (sorted doc ids, "
    "stringified per the registry's array convention). One "
    "explode + distinct (a token posts once per doc) + one "
    "aggregate; the posting list is CAPPED to a fixed-size segment "
    "exactly like a real index shards postings into blocks — an "
    "uncapped collect_list on a stop-word token would be "
    "corpus-sized, the classic build-side blowup. df stays exact "
    "over the full corpus. Output bounded to the top-50 tokens by "
    "(df, token). At 100 TB the index is written partitioned by "
    "token hash and each segment block is one row — queries probe "
    "segments by token equi-join, never scanning the corpus.",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        ).alias("token"),
    ).distinct()
    agg = tok.groupBy("token").agg(
        F.count("*").cast("long").alias("df"),
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(F.collect_list("doc_id")),
                    1,
                    INVIDX_SEGMENT,
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("posting_segment"),
    )
    # top-N via orderBy+limit, which compiles to TakeOrderedAndProject:
    # each partition keeps its local top-N and the driver merges N-sized
    # heaps — no single-partition global sort. The former row_number()
    # over an unpartitioned Window ran the whole vocabulary (10^8-10^9
    # rows at 100 TB) through one WindowExec partition.
    return agg.orderBy(F.desc("df"), F.asc("token")).limit(INVIDX_TOP_TOKENS)
