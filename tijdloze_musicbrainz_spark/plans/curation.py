"""Corpus-curation operators: denylist redaction, repetition-based
quality filtering (Gopher-style), and train/benchmark contamination
screening.

These are the pre-training data-curation passes that run AFTER dedup
(plans/dedup.py) and text profiling (plans/textops.py) in a real
pipeline: scrub terms that must not ship, drop degenerate repetitive
documents, and quarantine anything that overlaps a held-out benchmark.
All three are single-shuffle-or-less plans:

- redaction is a pure narrow map (regex, JVM-side);
- repetition stats fold inside each row (sort_array + aggregate), so
  the per-document top-bigram count never touches a shuffle — the
  win over the naive explode+groupBy(doc, bigram) formulation, whose
  shuffle carries one row per TOKEN of the corpus;
- contamination is one semi-join on shingle strings against a
  benchmark side small enough to broadcast at any corpus scale.

The DuckDB oracles deliberately use the NAIVE formulations (unnest +
group by), so they are independent implementations, not translations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .textops import (
    QUALITY_MAX_CHARS,
    QUALITY_MAX_PUNCT,
    QUALITY_MIN_CHARS,
    QUALITY_PUNCT_CLASS,
)
from .util import t

# Denylist for the redaction pass. Word-boundary alternation works
# identically in Java regex (Spark) and RE2 (DuckDB).
DENYLIST_PATTERN = r"\b(customer|supplier|order)\b"
REDACTION = "[REDACTED]"


@register(
    "text_denylist_redact",
    survey_ids=(),
    oracle=f"""
WITH red AS (
  SELECT source,
         len(regexp_extract_all(text, '{DENYLIST_PATTERN}')) AS n_hits,
         length(regexp_replace(text, '{DENYLIST_PATTERN}', '{REDACTION}', 'g'))
           AS redacted_len
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_hits,
       CAST(sum(n_hits) AS BIGINT) AS total_hits,
       CAST(sum(redacted_len) AS BIGINT) AS redacted_chars
FROM red
GROUP BY source
""",
    doc="Dictionary/denylist redaction — the scrubbing pass (PII terms, "
    "licensed strings) every shipped corpus runs. regexp_replace + "
    "regexp_count are pure JVM narrow ops (no UDF, no shuffle before "
    "the final per-source rollup); the redacted-length checksum makes "
    "the oracle verify the actual rewritten text, not just the "
    "match counts.",
)
def text_denylist_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    red = docs.select(
        "source",
        F.regexp_count(F.col("text"), F.lit(DENYLIST_PATTERN)).alias("n_hits"),
        F.length(
            F.regexp_replace(F.col("text"), DENYLIST_PATTERN, REDACTION)
        ).alias("redacted_len"),
    )
    return red.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0))
        .cast("long")
        .alias("docs_with_hits"),
        F.sum("n_hits").cast("long").alias("total_hits"),
        F.sum("redacted_len").cast("long").alias("redacted_chars"),
    )


# A document whose single most frequent bigram exceeds this share of
# all its bigrams is flagged repetitive (Gopher-rule shape: Rae et
# al. 2021 filter on duplicated n-gram fractions).
TOP_BIGRAM_RATIO_MAX = 0.04


@register(
    "text_repetition_filter",
    survey_ids=(),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS tk
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])) AS bigram
  FROM toks
),
counts AS (
  SELECT doc_id, bigram, count(*) AS n FROM grams GROUP BY doc_id, bigram
),
per_doc AS (
  SELECT doc_id, max(n) AS top_n, sum(n) AS n_bigrams
  FROM counts GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.tk) AS BIGINT) AS n_words,
       round((len(t.tk) - len(list_distinct(t.tk)))
             / CAST(nullif(len(t.tk), 0) AS DOUBLE), 6) AS dup_word_ratio,
       round(p.top_n / CAST(p.n_bigrams AS DOUBLE), 6) AS top_bigram_ratio,
       (p.top_n / CAST(p.n_bigrams AS DOUBLE)) > {TOP_BIGRAM_RATIO_MAX}
         AS is_repetitive
FROM toks t LEFT JOIN per_doc p USING (doc_id)
""",
    doc="Gopher-style repetition filter: per-document duplicate-word "
    "fraction and top-bigram share. The Spark plan computes the "
    "top-bigram count with an IN-ROW run-length fold over the SORTED "
    "bigram array (sort_array + aggregate with struct state) — zero "
    "shuffle, one narrow pass — where the naive formulation (the "
    "oracle's) shuffles one row per corpus token into a "
    "groupBy(doc, bigram). At 100 TB that shuffle is the whole job; "
    "the fold is free.",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    prepared = docs.select("doc_id", toks.alias("tk")).withColumn(
        "bg",
        F.sort_array(
            F.when(
                F.size("tk") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("tk") - 2),
                    lambda i: F.concat_ws(
                        " ", F.get(F.col("tk"), i), F.get(F.col("tk"), i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ),
    )
    # run-length fold: bigrams are sorted, so equal bigrams are
    # adjacent — track (previous value, current run, best run).
    top_n = F.expr(
        "aggregate(bg, "
        "  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L), "
        "  (acc, x) -> named_struct("
        "    'prev', x, "
        "    'run', IF(x <=> acc.prev, acc.run + 1, 1L), "
        "    'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1, 1L))), "
        "  acc -> acc.best)"
    )
    n_bigrams = F.size("bg").cast("double")
    ratio = top_n / F.nullif(n_bigrams, F.lit(0.0))
    return prepared.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_words"),
        # nullif: empty document -> NULL ratio, not a divide-by-zero
        F.round(
            (F.size("tk") - F.size(F.array_distinct("tk")))
            / F.nullif(F.size("tk"), F.lit(0)).cast("double"),
            6,
        ).alias("dup_word_ratio"),
        F.round(ratio, 6).alias("top_bigram_ratio"),
        (ratio > TOP_BIGRAM_RATIO_MAX).alias("is_repetitive"),
    )


# Contamination screen: documents from this source act as the held-out
# benchmark; any other document sharing a SHINGLE_N-gram with it is
# quarantined. Shingles join as raw token strings — no hash, so the
# cross-engine join key is trivially identical.
BENCH_SOURCE = "src0"
SHINGLE_N = 5


@register(
    "text_contamination_overlap",
    survey_ids=(),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, lang,
         list_filter(string_split(text, ' '), w -> w <> '') AS tk
  FROM documents
),
shingles AS (
  SELECT doc_id, source, lang,
         unnest(list_distinct(list_transform(
           range(1, len(tk) - {SHINGLE_N - 2}),
           i -> array_to_string(tk[i:i + {SHINGLE_N - 1}], ' ')
         ))) AS shingle
  FROM toks WHERE len(tk) >= {SHINGLE_N}
),
bench AS (
  SELECT DISTINCT shingle FROM shingles WHERE source = '{BENCH_SOURCE}'
),
contaminated AS (
  SELECT DISTINCT s.doc_id, s.lang
  FROM shingles s JOIN bench b USING (shingle)
  WHERE s.source <> '{BENCH_SOURCE}'
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(c.doc_id) AS BIGINT) AS n_contaminated,
       round(count(c.doc_id) / CAST(count(*) AS DOUBLE), 6)
         AS contamination_rate
FROM documents d
LEFT JOIN contaminated c ON d.doc_id = c.doc_id
WHERE d.source <> '{BENCH_SOURCE}'
GROUP BY d.lang
""",
    doc="Train/benchmark contamination screen (the n-gram-overlap "
    "decontamination every LLM data pipeline runs before training): "
    "5-gram shingles of the corpus semi-joined against the benchmark "
    "shingle set, rolled up to a per-language contamination rate. "
    "The benchmark side is DISTINCT shingles of the held-out set — "
    "small by construction, so Spark broadcasts it and the corpus "
    "side never shuffles; per-doc shingles are deduped in-row "
    "(array_distinct) before the explode to cut the probe volume.",
)
def text_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    # The shingle array is INLINED into explode() on purpose: naming it
    # as a column first lets InferFiltersFromGenerate add a
    # size(shingles) > 0 predicate that project-collapse then rewrites
    # back into the full interpreted transform(...) lambda INSIDE the
    # Filter — the whole shingle build runs twice per row (measured
    # 4.4 s vs 0.9 s at sf0.1). Inline generator input dodges the rule.
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("tk") - SHINGLE_N),
            lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i + 1, SHINGLE_N)),
        )
    )
    exploded = (
        docs.select("doc_id", "source", "lang", toks.alias("tk"))
        .filter(F.size("tk") >= SHINGLE_N)
        .select(
            "doc_id", "source", "lang", F.explode(shingles).alias("shingle")
        )
    )
    bench = (
        exploded.filter(F.col("source") == BENCH_SOURCE)
        .select("shingle")
        .distinct()
    )
    contaminated = (
        exploded.filter(F.col("source") != BENCH_SOURCE)
        .join(F.broadcast(bench), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = docs.filter(F.col("source") != BENCH_SOURCE)
    return (
        corpus.join(contaminated, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("hit").cast("long").alias("n_contaminated"),
            F.round(
                F.count("hit") / F.count("*").cast("double"), 6
            ).alias("contamination_rate"),
        )
    )


# Structured-PII patterns for the masking pass. The alternation-free
# per-category patterns below parse identically in Java regex (Spark)
# and RE2 (DuckDB): character classes, bounded repetition, \b word
# boundaries — no lookaround, no backreferences.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@register(
    "text_pii_mask",
    survey_ids=(),
    oracle=f"""
WITH aug AS (
  SELECT source,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@mail.example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                      || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 5) % 256 AS VARCHAR)
                 ELSE '' END AS text
  FROM documents
), masked AS (
  SELECT source,
         len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_email,
         len(regexp_extract_all(text, '{PII_PHONE}')) AS n_phone,
         len(regexp_extract_all(
             regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
             '{PII_IPV4}')) AS n_ip,
         length(
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
               '{PII_PHONE}', '<PHONE>', 'g'),
             '{PII_IPV4}', '<IP>', 'g')) AS masked_len
  FROM aug
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_email) AS BIGINT) AS emails_masked,
       CAST(sum(n_phone) AS BIGINT) AS phones_masked,
       CAST(sum(n_ip) AS BIGINT) AS ips_masked,
       CAST(sum(masked_len) AS BIGINT) AS masked_chars
FROM masked
GROUP BY source
""",
    doc="Structured-PII masking (emails, phone numbers, IPv4) — the "
    "scrubbing pass a shipped corpus runs after the dictionary "
    "denylist. The synthetic corpus carries no real PII, so the query "
    "first augments each document with doc_id-derived PII "
    "deterministically on BOTH engines, then masks; the per-source "
    "match counts plus the masked-length checksum verify the actual "
    "rewritten text. Pure JVM regexp narrow ops — no UDF, no shuffle "
    "before the final per-source rollup. IP counting happens after "
    "email masking on both engines (an address inside an email host "
    "would otherwise double-count).",
)
def text_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" contact user"), s(did), F.lit("@mail.example.com")),
        ).otherwise(""),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad(s(did % 1000), 3, "0"),
                F.lit("-"),
                F.lpad(s((did * 7) % 10000), 4, "0"),
            ),
        ).otherwise(""),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" from 10."),
                s(did % 256),
                F.lit("."),
                s((did * 3) % 256),
                F.lit("."),
                s((did * 5) % 256),
            ),
        ).otherwise(""),
    )
    email_masked = F.regexp_replace(aug, PII_EMAIL, "<EMAIL>")
    fully_masked = F.regexp_replace(
        F.regexp_replace(email_masked, PII_PHONE, "<PHONE>"), PII_IPV4, "<IP>"
    )
    masked = docs.select(
        "source",
        F.regexp_count(aug, F.lit(PII_EMAIL)).alias("n_email"),
        F.regexp_count(aug, F.lit(PII_PHONE)).alias("n_phone"),
        F.regexp_count(email_masked, F.lit(PII_IPV4)).alias("n_ip"),
        F.length(fully_masked).alias("masked_len"),
    )
    return masked.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_email").cast("long").alias("emails_masked"),
        F.sum("n_phone").cast("long").alias("phones_masked"),
        F.sum("n_ip").cast("long").alias("ips_masked"),
        F.sum("masked_len").cast("long").alias("masked_chars"),
    )


@register(
    "corpus_curation_scorecard",
    survey_ids=("A1", "F4", "F15"),
    oracle=f"""
WITH per_doc AS (
  SELECT source,
         length(text) AS n,
         len(string_split(text, ' ')) AS n_tok,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         length(regexp_replace(text, '{QUALITY_PUNCT_CLASS}', '', 'g')) AS n_punct,
         len(regexp_extract_all(text, '{DENYLIST_PATTERN}')) AS n_deny,
         md5(lower(trim(text))) AS digest
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(CASE WHEN n >= {QUALITY_MIN_CHARS} AND n <= {QUALITY_MAX_CHARS}
                            AND CAST(n_punct AS DOUBLE) / n < {QUALITY_MAX_PUNCT}
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS quality_pass_rate,
       round(1.0 - CAST(count(DISTINCT digest) AS DOUBLE) / count(*), 6)
         AS exact_dup_rate,
       round(CAST(sum(CASE WHEN n_deny > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS denylist_hit_rate,
       round(CAST(sum(CAST(round(
                 CAST(n_tok - n_distinct AS DOUBLE) / n_tok, 6)
             AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6)
         AS mean_dup_word_ratio,
       round(CAST(sum(CAST(n_tok AS DECIMAL(25,6))) AS DOUBLE) / count(*), 2)
         AS mean_tokens
FROM per_doc
GROUP BY source
""",
    doc="The corpus datasheet: one row per source with the signals a "
    "curation review reads first — quality-gate pass rate, "
    "within-source exact-duplicate rate (md5 digest, the same "
    "canonicalization the exact-dedup tier groups by), denylist hit "
    "rate, mean duplicated-word ratio, mean token count. One narrow "
    "projection + one aggregate (the digest COUNT DISTINCT is the "
    "only expansion); per-doc ratios are single divisions rounded "
    "before the exact-DECIMAL mean so the rollup is "
    "partition-order-free.",
)
def corpus_curation_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n = F.length("text")
    ws = F.split(F.col("text"), " ")
    n_tok = F.size(ws)
    n_distinct = F.size(F.array_distinct(ws))
    n_punct = F.length(F.regexp_replace(F.col("text"), "[a-z0-9 ]", ""))
    n_deny = F.regexp_count(F.col("text"), F.lit(DENYLIST_PATTERN))
    per_doc = docs.select(
        "source",
        n.alias("n"),
        n_tok.alias("n_tok"),
        n_distinct.alias("n_distinct"),
        n_punct.alias("n_punct"),
        n_deny.alias("n_deny"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("digest"),
    )
    # the shared gate's thresholds over this query's precomputed
    # columns (n/n_punct also feed other scorecard outputs)
    passes = (
        (F.col("n") >= QUALITY_MIN_CHARS)
        & (F.col("n") <= QUALITY_MAX_CHARS)
        & (F.col("n_punct").cast("double") / F.col("n") < QUALITY_MAX_PUNCT)
    )
    dup_ratio_term = F.round(
        (F.col("n_tok") - F.col("n_distinct")).cast("double") / F.col("n_tok"), 6
    ).cast("decimal(25,6)")
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(
            F.sum(F.when(passes, 1).otherwise(0)).cast("double") / F.count("*"), 6
        ).alias("quality_pass_rate"),
        F.round(
            1.0 - F.countDistinct("digest").cast("double") / F.count("*"), 6
        ).alias("exact_dup_rate"),
        F.round(
            F.sum(F.when(F.col("n_deny") > 0, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("denylist_hit_rate"),
        F.round(
            F.sum(dup_ratio_term).cast("double") / F.count("*"), 6
        ).alias("mean_dup_word_ratio"),
        F.round(
            F.sum(F.col("n_tok").cast("decimal(25,6)")).cast("double")
            / F.count("*"),
            2,
        ).alias("mean_tokens"),
    )


# -- BM25 retrieval ---------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10
# fixed query terms (mid-frequency corpus words) — a deterministic
# retrieval workload; a real engine parameterizes these (P10 pattern)
BM25_QUERY = ("join", "vector", "slow")


def _bm25_term_sql(term: str, i: int) -> str:
    return (
        f"round(ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1) * "
        f"tf{i} * ({BM25_K1} + 1) / "
        f"(tf{i} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / nullif(avgdl, 0))), 9)"
    )


@register(
    "text_bm25_topk",
    survey_ids=(),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS tk
  FROM documents
),
sized AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS dl,
         {", ".join(f"CAST(len(list_filter(tk, w -> w = '{t}')) AS BIGINT) AS tf{i}" for i, t in enumerate(BM25_QUERY))}
  FROM toks
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) * 1.0 / count(*) AS avgdl,
         {", ".join(f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}" for i in range(len(BM25_QUERY)))}
  FROM sized
),
scored AS (
  SELECT doc_id,
         round({" + ".join(_bm25_term_sql(t, i) for i, t in enumerate(BM25_QUERY))}, 6) AS bm25
  FROM sized CROSS JOIN stats
)
SELECT doc_id, bm25 FROM scored
WHERE bm25 > 0
ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP_K}
""",
    doc="BM25 top-k retrieval (Robertson-Sparck Jones; the lexical "
    "baseline every RAG pipeline keeps beside its embedding index): "
    "per-document term frequencies for the fixed query terms are "
    "computed IN-ROW (filter+len on the token array — never an "
    "explode of the corpus for a 3-term query), corpus stats "
    "(N, avgdl, per-term df) fold to ONE row that cross-joins back "
    "as a broadcast scalar, and the top-k is a global "
    "TakeOrdered (no window). Per-term scores round to 9 digits "
    "before summing and the sum to 6 — ln() may differ in the last "
    "ulp between engines, rounding absorbs it. At 100 TB the same "
    "plan holds: one narrow pass + one single-row aggregate + "
    "TakeOrdered; a multi-term ad-hoc workload would swap the in-row "
    "tf columns for an inverted-index join (the ExactSubstr "
    "playbook).",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.col("text"), " "), lambda w: w != "")

    def tf_expr(term: str):
        # NB: the closure takes ONE lambda param — a two-param lambda
        # (even via a default arg) is interpreted by Spark as
        # (element, index) and the "term" becomes the index column
        return F.size(F.filter(tk, lambda w: w == term)).cast("long")

    sized = docs.select(
        "doc_id",
        F.size(tk).cast("long").alias("dl"),
        *[tf_expr(term).alias(f"tf{i}") for i, term in enumerate(BM25_QUERY)],
    )
    stats = sized.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("long") * F.lit(1.0) / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df{i}")
            for i in range(len(BM25_QUERY))
        ],
    )

    def term_score(i: int):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df{i}") + 0.5)
            / (F.col(f"df{i}") + 0.5)
            + 1
        )
        tf = F.col(f"tf{i}")
        return F.round(
            idf
            * tf
            * (BM25_K1 + 1)
            / (
                tf
                + BM25_K1
                * (
                    1
                    - BM25_B
                    # nullif: an ALL-EMPTY corpus makes avgdl 0.0 and
                    # dl/0.0 an IEEE NaN that DuckDB's NaN>0 would KEEP
                    # while Spark drops — NULL excludes on both engines
                    + BM25_B * F.col("dl") / F.nullif(F.col("avgdl"), F.lit(0.0))
                )
            ),
            9,
        )

    scored = sized.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        F.round(
            sum(term_score(i) for i in range(len(BM25_QUERY))), 6
        ).alias("bm25"),
    )
    return (
        scored.filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOP_K)
    )


# -- Data-quality constraint audit (r6) --------------------------------------

AUDIT_LANG_DOMAIN = ("de", "en", "es", "fr", "zh")


@register(
    "corpus_constraint_audit",
    survey_ids=("A1", "F4"),
    oracle=f"""
WITH s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(count(text) AS DOUBLE) AS n_text,
         CAST(count(doc_id) AS DOUBLE) AS n_id,
         CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_uniq,
         CAST(sum(CASE WHEN lang IN ('de','en','es','fr','zh')
                       THEN 1 ELSE 0 END) AS DOUBLE) AS n_lang,
         CAST(sum(CASE WHEN n_chars = length(text)
                       THEN 1 ELSE 0 END) AS DOUBLE) AS n_len_ok,
         CAST(sum(CASE WHEN n_chars >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
           AS n_nonneg
  FROM documents
)
SELECT ck.check_name, ck.observed,
       CAST(ck.threshold AS DOUBLE) AS threshold,
       ck.observed >= ck.threshold AS passed
FROM s, LATERAL (VALUES
  ('completeness_text',   round(n_text / n, 6),   0.99),
  ('completeness_doc_id', round(n_id / n, 6),     1.0),
  ('uniqueness_doc_id',   round(n_uniq / n, 6),   1.0),
  ('lang_in_domain',      round(n_lang / n, 6),   1.0),
  ('n_chars_matches_text', round(n_len_ok / n, 6), 0.99),
  ('n_chars_nonnegative', round(n_nonneg / n, 6), 1.0)
) AS ck(check_name, observed, threshold)
""",
    doc="Declarative data-quality CONSTRAINT AUDIT over the corpus "
    "(the Deequ/expectations pattern — the admission gate a 100 TB "
    "ingest runs before data reaches training): completeness, key "
    "uniqueness, categorical domain membership, and cross-column "
    "consistency (n_chars == length(text)) computed in ONE pass of "
    "conditional aggregates (a single scan + one 1-row aggregate — "
    "no per-check scans), then unpivoted to (check, observed, "
    "threshold, passed) rows. Thresholds are part of the contract: "
    "the driver hash-checks observed values AND pass/fail verdicts, "
    "so a silently drifting corpus (new lang, duplicate ids, "
    "truncated text) flips a row to failed and the hash goes red.",
)
def corpus_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n = F.count("*").cast("double")
    share = lambda c: F.round(c.cast("double") / n, 6)  # noqa: E731
    s = docs.agg(
        share(F.count("text")).alias("completeness_text"),
        share(F.count("doc_id")).alias("completeness_doc_id"),
        share(F.countDistinct("doc_id")).alias("uniqueness_doc_id"),
        share(
            F.sum(
                F.when(F.col("lang").isin(*AUDIT_LANG_DOMAIN), 1).otherwise(0)
            )
        ).alias("lang_in_domain"),
        share(
            F.sum(
                F.when(F.col("n_chars") == F.length("text"), 1).otherwise(0)
            )
        ).alias("n_chars_matches_text"),
        share(F.sum(F.when(F.col("n_chars") >= 0, 1).otherwise(0))).alias(
            "n_chars_nonnegative"
        ),
    )
    thresholds = {
        "completeness_text": 0.99,
        "completeness_doc_id": 1.0,
        "uniqueness_doc_id": 1.0,
        "lang_in_domain": 1.0,
        "n_chars_matches_text": 0.99,
        "n_chars_nonnegative": 1.0,
    }
    checks = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(name).alias("observed"),
                F.lit(thr).alias("threshold"),
            )
            for name, thr in thresholds.items()
        ]
    )
    return (
        s.select(F.explode(checks).alias("c"))
        .select("c.check_name", "c.observed", "c.threshold")
        .withColumn("passed", F.col("observed") >= F.col("threshold"))
    )
