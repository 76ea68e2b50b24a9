"""Similarity search over the ``embeddings`` table (``array<float>``,
64-dim) — the ANN extension surface of the brief (no reference twin).

The core registered queries (plus the IVF ANN, the pandas top-k lane,
int8 quantization, the k-means Lloyd step, the LSH-bucketed and
tight-threshold near-dup scale paths, and SemDeDup — see each
docstring):

1. ``sim_cosine_topk_exact`` — brute-force cosine top-k for a small
   query set: broadcast the queries against the corpus, score, top-k
   per query. This is the oracle-checkable baseline; the scan is
   O(|Q|·N) with |Q| tiny, which IS the right plan at scale when the
   query side broadcasts (one pass over the corpus, no shuffle of the
   corpus at all).
2. ``sim_ann_lsh_bucketed`` — sign-random-projection LSH: 24 bands x
   4 hyperplane sign bits per vector; queries and corpus explode to
   (band_key, id) and equi-join on the bucket; bucket candidates are
   re-ranked by exact cosine. Approximate RECALL by construction, but
   fully DETERMINISTIC given the seeded hyperplanes — so it is
   oracle-checked: the planes are integer weights in a committed
   parquet side table both engines share (Spark regenerates them
   from the seed; a test pins equality) and the sign bits are exact
   int64 arithmetic over ``floor(x*1e6)``-quantized components, so
   DuckDB reproduces the buckets bit-for-bit and then re-ranks with
   the same rounded exact cosine (the SimHash playbook, via a side
   table). At 100 TB this replaces the corpus broadcast-scan with a
   broadcast bucket probe: candidate generation is id-only (the
   24·|Q| query bucket keys broadcast, the corpus's exploded keys
   never shuffle), pair dedup ships two longs per collision, and the
   vectors are fetched once afterwards — never O(N·Q) for large Q
   and never an array-carrying 24·N shuffle.
3. ``sim_embedding_near_dup`` — the embedding-cosine near-dup tier of
   the dedup suite: all pairs with cosine >= 0.45. Exact oracle
   baseline, since r4c BLOCKED: 16 hash blocks, one numpy matmul per
   block pair (127x over the old per-pair interpreted fold); the LSH
   variant above is the scale path for this too.

Expression-lane dot products run as ``zip_with``/``aggregate`` folds
over ``array<double>`` — sequential in index order; results are
rounded to 6 digits before ranking so both engines rank identical
values. Zero-norm vectors yield NULL cosine on BOTH engines (the
oracles use an explicit dot/nullif(norms) formula because DuckDB's
NaN compares greater than everything) and are excluded from every
match set. The folds are interpreted (not codegen) — fine for
64-dim × small candidate sets; wide batches take the numpy-matmul
lanes (``sim_cosine_topk_pandas``, the blocked near-dup).
"""


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
from .exact import (  # noqa: F401
    sim_cosine_topk_exact,
    sim_cosine_topk_pandas,
    sim_embedding_near_dup,
    sim_embedding_quantize_int8,
)
from .lsh import (  # noqa: F401
    MAX_LOOSE_LSH_N,
    PLANES_FIXTURE,
    TIGHT_BANDS,
    TIGHT_BITS,
    TIGHT_PLANES_FIXTURE,
    TIGHT_TAU,
    _band_keys_udf,
    _band_keys_udf_for,
    _guard_loose_lsh,
    _planes,
    _planes_tight,
    sim_ann_lsh_bucketed,
    sim_near_dup_lsh_bucketed,
    sim_near_dup_lsh_tight,
)
from .ivf import (  # noqa: F401
    SEMDEDUP_CENT_CHUNK,
    SEMDEDUP_TAU,
    _assign_centroids_chunked,
    dedup_semantic_semdedup,
    ml_kmeans_lloyd_iterated,
    ml_kmeans_lloyd_step,
    sim_ann_ivf_bucketed,
    sim_ann_ivf_partitioned_lists,
)
from .pq_lifecycle import (  # noqa: F401
    PQ_CB_CAP,
    PQ_CB_MOD,
    PQ_M,
    PQ_SUB,
    PQ_TOP_C,
    sim_ann_ivf_pq,
    sim_ann_ivf_pq_append,
    sim_ann_ivf_pq_compacted,
    sim_ann_ivf_pq_persisted,
    sim_ann_ivf_pq_retrain,
    sim_ann_ivf_pq_trained,
    streaming_ann_index_ingest,
    streaming_ann_ingest_restart,
)
