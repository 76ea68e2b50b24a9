"""Incremental duplicate CLUSTERING against a PERSISTED label store —
the cluster tier's lifecycle, completing the trilogy the ANN index
(similarity/pq_lifecycle.py) and the MinHash band index
(dedup_index.py) started: the historical corpus is clustered ONCE;
each arriving batch is paired only against the stored block index,
merged into the existing components on a CONTRACTED graph whose size
is O(delta-touched components), and the label store is updated with
an append + a remap — never re-pairing history with itself, never
re-running connected components over the full corpus.

Storage layout (the 100 TB story):
- ``blocks``: (blk, doc_id), a BUCKETED table on blk
  (sources/bucketing.py) — the probe join co-locates against the
  stored side with NO shuffle of the index (same lever as the band
  table in dedup_index.py).
- ``shingles``: (doc_id, sgs) parquet — the verify payload, fetched
  by id only for blk-colliding candidate pairs.
- ``labels``: (doc_id, cluster_id) parquet — every indexed document's
  current component label (the component's minimum doc_id).
- ``remaps``: (old_label, new_label) parquet — the merge journal.
  A batch that bridges existing components does NOT rewrite the
  O(corpus) label store; it appends the delta's labels plus the
  handful of (old → new) label moves, and readers resolve
  ``coalesce(remap.new_label, cluster_id)``. Periodic compaction
  folds remap generations back into the base labels (the same
  scheduled-maintenance role compaction plays for the other two
  index tiers); within one generation the resolution is a single
  broadcast-sized join.

Merge correctness: contracting every stored component to its label
node is a connectivity-preserving homomorphism, so running
large-star/small-star (plans/dedup.py::connected_components) over
{contracted pair endpoints} yields exactly the full-corpus
components; and because a stored label IS the minimum doc_id of its
subset, the minimum over merged nodes is the global component
minimum — incremental labels are bit-identical to a from-scratch
batch run (pinned in tests/test_cc_index.py and by the DuckDB
recursive-CTE oracle over the whole corpus).

No reference twin (extension surface); the lifecycle pattern and the
O(delta) accounting rule are shared via plans/lifecycle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.bucketing import exclusive_append, write_bucketed
from .dedup import (
    _SHINGLES_SQL,
    connected_components,
    jaccard,
    shingles_col,
    words_col,
)
from .lifecycle import sf_tag
from .registry import register
from .util import t

# Every CC_DELTA_MOD-th document "arrives" after the base clustering —
# the same deterministic split as the MinHash index lifecycle.
CC_DELTA_MOD = 10
CC_INDEX_BUCKETS = 16

_CC_INC_ORACLE = f"""
WITH RECURSIVE
w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
sh AS (
  SELECT doc_id,
         array_to_string(list_slice(ws, 1, 5), ' ') AS blk,
         {_SHINGLES_SQL} AS sgs
  FROM w
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sgs, b.sgs)) * 1.0
        / len(list_distinct(list_concat(a.sgs, b.sgs))) >= 0.9
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(id, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u
),
labels AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_indexed
FROM documents d LEFT JOIN labels l ON d.doc_id = l.id
"""


def _payload(docs: DataFrame) -> DataFrame:
    """(doc_id, blk, sgs): the block key (first 5 tokens) that gates
    candidate generation plus the shingle set that verifies it — the
    same keys as the batch operator dedup_ngram_jaccard_blocked."""
    return docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.col("ws"), 1, 5)).alias("blk"),
        shingles_col(F.col("ws")).alias("sgs"),
    )


def _pairs_of(payload: DataFrame) -> DataFrame:
    """Blocked exact-Jaccard pairs within one payload frame (the
    build-time base-vs-base pass)."""
    a = payload.alias("a")
    b = payload.alias("b")
    jac = jaccard(F.col("a.sgs"), F.col("b.sgs"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(jac >= 0.9)
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )


def _build_and_ingest(
    spark: SparkSession, sf_dir: str, name: str
) -> tuple[str, dict[str, str], int]:
    """Build the base cluster store (bucketed blocks + shingle payload
    + labels), then append the arriving batch's payload file-level.
    Returns (blocks_table, paths, n_indexed). ``n_indexed`` follows
    the shared accounting rule (plans/lifecycle.py): base count at
    build + delta count at append, from DataFrames in hand — never a
    re-scan of the store."""
    import shutil  # noqa: PLC0415

    from .etl import SINK_ROOT  # noqa: PLC0415

    docs_all = t(spark, sf_dir, "documents").select("doc_id")
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", words_col().alias("ws"))
    )
    pay = _payload(docs)
    base_pay = pay.filter(F.col("doc_id") % CC_DELTA_MOD != 0)

    tag = sf_tag(sf_dir)
    t_blocks = f"{name}_blocks_{tag}"
    paths = {
        "blocks": f"{SINK_ROOT}/{t_blocks}",
        "shingles": f"{SINK_ROOT}/{name}_shingles_{tag}",
        "labels": f"{SINK_ROOT}/{name}_labels_{tag}",
        "remaps": f"{SINK_ROOT}/{name}_remaps_{tag}",
        "delta": f"{SINK_ROOT}/{name}_delta_{tag}",
        "delta_ids": f"{SINK_ROOT}/{name}_delta_ids_{tag}",
    }
    for p in paths.values():
        shutil.rmtree(p, ignore_errors=True)

    # -- build: the ONE corpus-linear clustering pass over the base ----
    base_labels, _ = connected_components(
        _pairs_of(base_pay).select(
            F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
        )
    )
    base_ids = docs_all.filter(F.col("doc_id") % CC_DELTA_MOD != 0)
    base_ids.join(
        base_labels, base_ids.doc_id == base_labels.id, "left"
    ).select(
        "doc_id", F.coalesce("label", "doc_id").alias("cluster_id")
    ).write.parquet(paths["labels"])
    write_bucketed(
        base_pay.select("blk", "doc_id"),
        t_blocks,
        bucket_cols=["blk"],
        num_buckets=CC_INDEX_BUCKETS,
        sort_cols=["blk"],
        location=paths["blocks"],
    )
    base_pay.select("doc_id", "sgs").write.parquet(paths["shingles"])
    n_base = base_ids.count()

    # -- ingest: stage the arriving batch's payload ONCE, append
    # file-level under the index's single-writer lock (the same
    # transaction discipline as the MinHash index ingest).
    pay.filter(F.col("doc_id") % CC_DELTA_MOD == 0).write.parquet(
        paths["delta"]
    )
    delta_ids = docs_all.filter(F.col("doc_id") % CC_DELTA_MOD == 0)
    delta_ids.write.parquet(paths["delta_ids"])
    staged = spark.read.schema("doc_id bigint, blk string, sgs array<string>").parquet(
        paths["delta"]
    )
    with exclusive_append(paths["blocks"], owner=name):
        staged.select("blk", "doc_id").write.mode("append").format(
            "parquet"
        ).bucketBy(CC_INDEX_BUCKETS, "blk").sortBy("blk").saveAsTable(t_blocks)
        staged.select("doc_id", "sgs").write.mode("append").parquet(
            paths["shingles"]
        )
        n_delta = delta_ids.count()
    return t_blocks, paths, n_base + n_delta


def _probe_pairs(
    spark: SparkSession, t_blocks: str, paths: dict[str, str]
) -> DataFrame:
    """Verified near-dup pairs with at least one arriving endpoint:
    the staged delta blocks (signed once at ingest) merge-join the
    bucketed store in place — no shuffle of the index — and exact
    Jaccard over by-id shingle fetches verifies blk collisions. Pure
    plan construction (the bucketed-scan + sort-merge shape is pinned
    in tests/test_cc_index.py)."""
    probes = (
        spark.read.schema("doc_id bigint, blk string")
        .parquet(paths["delta"])
        .select(F.col("doc_id").alias("probe_id"), "blk")
    )
    stored_blocks = spark.table(t_blocks)
    cand = (
        probes.join(stored_blocks.hint("merge"), "blk")
        .filter(F.col("probe_id") != F.col("doc_id"))
        .select(
            F.least("probe_id", "doc_id").alias("doc_a"),
            F.greatest("probe_id", "doc_id").alias("doc_b"),
        )
        .distinct()
    )
    stored_sh = spark.read.schema("doc_id bigint, sgs array<string>").parquet(
        paths["shingles"]
    )
    sh_a = stored_sh.select(
        F.col("doc_id").alias("doc_a"), F.col("sgs").alias("sgs_a")
    )
    sh_b = stored_sh.select(
        F.col("doc_id").alias("doc_b"), F.col("sgs").alias("sgs_b")
    )
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .filter(jaccard(F.col("sgs_a"), F.col("sgs_b")) >= 0.9)
        .select("doc_a", "doc_b")
    )


def _merge_and_resolve(
    spark: SparkSession, t_blocks: str, paths: dict[str, str], n_indexed: int
) -> DataFrame:
    """Pair the arrivals against the stored block index (one
    co-located merge join), run connected components on the CONTRACTED
    graph (stored endpoints replaced by their stored labels — node
    count is O(delta-touched components), not O(corpus)), append the
    delta's labels plus the (old → new) remap journal, and return the
    resolved label set read back from the UPDATED store."""
    new_pairs = _probe_pairs(spark, t_blocks, paths)

    # -- contract: stored endpoints become their stored labels ---------
    stored_labels = spark.read.schema(
        "doc_id bigint, cluster_id bigint"
    ).parquet(paths["labels"])
    la = stored_labels.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("lbl_a")
    )
    lb = stored_labels.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("lbl_b")
    )
    contracted = (
        new_pairs.join(la, "doc_a", "left")
        .join(lb, "doc_b", "left")
        .select(
            F.coalesce("lbl_a", "doc_a").alias("u"),
            F.coalesce("lbl_b", "doc_b").alias("v"),
        )
    )
    merged, _ = connected_components(contracted)

    # -- update the store: delta labels append + remap journal ---------
    delta_ids = spark.read.schema("doc_id bigint").parquet(paths["delta_ids"])
    delta_ids.join(merged, delta_ids.doc_id == merged.id, "left").select(
        "doc_id", F.coalesce("label", "doc_id").alias("cluster_id")
    ).write.mode("append").parquet(paths["labels"])
    merged.filter(
        (F.col("id") != F.col("label")) & (F.col("id") % CC_DELTA_MOD != 0)
    ).select(
        F.col("id").alias("old_label"), F.col("label").alias("new_label")
    ).write.parquet(paths["remaps"])

    # -- resolve: current labels = stored labels through the remap -----
    labels = spark.read.schema("doc_id bigint, cluster_id bigint").parquet(
        paths["labels"]
    )
    remaps = spark.read.schema("old_label bigint, new_label bigint").parquet(
        paths["remaps"]
    )
    return labels.join(
        F.broadcast(remaps),
        labels.cluster_id == remaps.old_label,
        "left",
    ).select(
        "doc_id",
        F.coalesce("new_label", "cluster_id").alias("cluster_id"),
        F.lit(n_indexed).cast("long").alias("n_indexed"),
    )


@register(
    "dedup_cluster_incremental",
    survey_ids=(),
    oracle=_CC_INC_ORACLE,
    doc="INCREMENTAL duplicate clustering against a persisted label "
    "store — the cluster tier's lifecycle, completing the trilogy "
    "with the ANN index (pq_lifecycle.py) and the MinHash band index "
    "(dedup_index.py): cluster the base corpus once (blocked-Jaccard "
    "pairs -> large-star/small-star components), persist blocks as a "
    "BUCKETED table on blk + shingle verify payload + (doc_id, "
    "cluster_id) labels; the arriving batch (every 10th doc) is "
    "paired by ONE co-located merge join against the updated block "
    "store, components merge on a CONTRACTED graph (stored endpoints "
    "replaced by their labels — O(delta-touched components) nodes, "
    "never the corpus), and the label store is updated by appending "
    "the delta's labels plus an (old_label -> new_label) REMAP "
    "journal instead of rewriting O(corpus) labels; readers resolve "
    "through one broadcast join, and periodic compaction folds remap "
    "generations into the base (the other tiers' small-file "
    "counterweight, applied to labels). Contraction is a "
    "connectivity-preserving homomorphism and stored labels are "
    "component minima, so incremental labels are bit-identical to a "
    "from-scratch batch run: the oracle is the SAME full-corpus "
    "recursive-CTE closure as dedup_cluster_components, plus the "
    "incrementally-maintained n_indexed accounting column "
    "(plans/lifecycle.py rule — counted from batches in hand, never "
    "by re-scanning the store). At 100 TB this replaces re-clustering "
    "history+delta (O(corpus) CC per batch, the published CC-over-"
    "MapReduce cost) with an O(delta) probe + a near-constant merge: "
    "relabel cascades touch only bridged components. No reference "
    "twin (extension surface).",
)
def dedup_cluster_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    t_blocks, paths, n_indexed = _build_and_ingest(spark, sf_dir, "cc_index")
    return _merge_and_resolve(spark, t_blocks, paths, n_indexed)
