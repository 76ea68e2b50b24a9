"""Edge-case differential harness for the r4c operators: a constructed
documents table exercises branches the driver testdata never reaches
(empty text, docs shorter than K_SPAN, a doc larger than the packing
budget, heavy in-document gram repetition, double spaces), and each
query's Spark builder is compared against its own DuckDB oracle on the
SAME parquet — the full differential contract, just on hostile rows."""

from __future__ import annotations

import math

import duckdb
import pytest

from tijdloze_musicbrainz_spark.plans import REGISTRY

EDGE_QUERIES = [
    "dedup_exact_substring_spans",
    "dedup_exact_substring_spans_k50",
    "dedup_exact_substring_cut",
    "corpus_pack_sequences",
    "corpus_chunk_overlap",
    "text_repetition_filter",
    "text_bm25_topk",
    "text_bpe_train_merges",
    # r6: merge application + the trained-token span pass + the audit
    # must survive empty docs, NULL text, and double spaces identically
    "text_bpe_apply_merges",
    "dedup_exact_substring_bpe_trained",
    "corpus_constraint_audit",
    # broader per-document tier on the same hostile rows
    "dedup_exact_first_wins",
    "dedup_ngram_jaccard_blocked",
    # r12: the capped meta-blocking variant on the same hostile rows —
    # every block here is under both caps, so the accounting columns
    # must read all-zero and the pairs must match the oracle exactly
    "dedup_ngram_jaccard_meta_blocked",
    "dedup_minhash_lsh",
    "dedup_cluster_components",
    "dedup_cluster_keep_best",
    "dedup_simhash",
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
    "text_fingerprint",
    "text_denylist_redact",
    "text_pii_mask",
    "text_contamination_overlap",
    "corpus_split_train_val_test",
    "corpus_shard_by_token_budget",
    "corpus_stats_rollup",
    "corpus_curation_scorecard",
    "text_wordcount_topk",
    "text_length_percentiles",
    # r8b: the exact similarity joins and the IR index on the same
    # hostile rows — empty/NULL text must produce no prefixes, no
    # candidates and no postings identically; the planted duplicate
    # pair (8, 9) must qualify under Jaccard AND both containment
    # directions
    "dedup_jaccard_prefix_filter",
    "dedup_containment_join",
    "text_inverted_index",
    # r11: the index lifecycles on the same hostile rows — BOTH
    # arriving docs are degenerate here (doc 0 = empty text, doc 10 =
    # NULL text), so the probe/merge/refresh paths must handle an
    # all-degenerate delta batch identically to the oracles (empty
    # text pairs only with empty text; NULL text pairs with nothing
    # but still gets its label/ledger row)
    "dedup_minhash_incremental",
    "dedup_minhash_index_compact",
    "dedup_cluster_incremental",
    "dedup_cluster_label_compact",
    "corpus_incremental_refresh_e2e",
    "streaming_cluster_ingest_restart",
]

DOCS = [
    (0, "", "en", "srcA"),
    (1, "one", "en", "srcA"),
    (2, "a b c d e f g", "en", "srcA"),  # K_SPAN - 1 tokens
    (3, "a b c d e f g h", "en", "srcA"),  # exactly K_SPAN
    (4, "  double  spaces   here  ", "en", "srcB"),
    # oversized vs PACK_TOKEN_BUDGET=256 -> singleton sequence
    (5, " ".join(f"w{i}" for i in range(300)), "en", "srcB"),
    # heavy in-doc repetition: the same 8-gram recurs within ONE doc
    (6, " ".join(["r"] * 40), "en", "srcB"),
    # cross-doc duplicated span: shares an 8+-gram with doc 3
    (7, "a b c d e f g h extra tail words", "en", "srcA"),
    # planted near-dup pair: same first-5-words block, Jaccard ~1,
    # hamming-0 simhash twins
    (8, "the quick brown fox jumps over the lazy dog again today", "en", "srcC"),
    (9, "the quick brown fox jumps over the lazy dog again today", "en", "srcC"),
    # NULL text: split/len/shingle folds must agree on NULL handling
    # across engines (Spark size(NULL array) is NULL post-3.0, DuckDB
    # len(NULL) is NULL — but any query materializing counts must not
    # crash or diverge)
    (10, None, "en", "srcC"),
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus")
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t) if t is not None else None) for i, t, lang, src in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_matches_oracle(spark, edge_dir, name):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, edge_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        [tuple(_canon(r[c]) for c in scols) for r in sdf.collect()], key=repr
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    rel = con.execute(spec.oracle)
    cols0 = [d[0] for d in rel.description]
    idx = [cols0.index(c) for c in sorted(cols0)]
    drows = sorted(
        [tuple(_canon(r[i]) for i in idx) for r in rel.fetchall()], key=repr
    )
    assert scols == sorted(cols0), (scols, sorted(cols0))
    assert srows == drows, (
        f"{name}: first diffs "
        f"{[(a, b) for a, b in zip(srows, drows) if a != b][:3]}"
    )
