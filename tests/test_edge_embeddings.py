"""Edge-case differential harness for the similarity tier: a
constructed embeddings table with a zero-norm vector, exact duplicate
vectors, and an antipodal pair — zero vectors must be EXCLUDED (NULL
cosine on both engines), never an ANSI divide-by-zero or a
NaN-that-sorts-first in DuckDB."""

from __future__ import annotations

import math

import duckdb
import pytest

from tijdloze_musicbrainz_spark.plans import REGISTRY

EDGE_EMBEDDING_QUERIES = [
    "sim_cosine_topk_exact",
    "sim_cosine_topk_pandas",
    "sim_embedding_near_dup",
    "sim_embedding_quantize_int8",
    "sim_near_dup_lsh_bucketed",
    "dedup_semantic_semdedup",
    "sim_near_dup_lsh_tight",
    # r8b: the PQ pair degenerates gracefully here (the id-capped
    # codebook collapses to a single entry on this tiny corpus, so
    # every ADC distance ties and match_id breaks them) — the NULL
    # embedding and the zero vector must still quantize/encode
    # without crashing either engine
    "sim_ann_ivf_pq",
    "sim_ann_ivf_pq_trained",
    # r9: the persisted-index variants share the encode path but add
    # the partitioned write + pruned read and the frozen-codebook
    # delta ingest — both must survive the zero/NULL vectors too
    "sim_ann_ivf_pq_persisted",
    "sim_ann_ivf_pq_append",
    "sim_ann_ivf_pq_retrain",
]

DIM = 64


@pytest.fixture(scope="module")
def edge_embeddings_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_embeddings")
    con = duckdb.connect()
    vecs = []
    base = [0.1 * ((i % 7) - 3) for i in range(DIM)]
    # vec_id 0 is a QUERY (vec_id % 100 == 0): a normal vector
    vecs.append((0, base))
    # zero-norm vector: matches nothing, quantizes to all-zero codes
    vecs.append((7, [0.0] * DIM))
    # exact duplicates of the query (cosine 1.0) and an antipodal copy
    vecs.append((8, list(base)))
    vecs.append((9, [-x for x in base]))
    # filler vectors so top-k has candidates
    for i in range(10, 30):
        vecs.append((i, [math.sin(i * j + 1) for j in range(DIM)]))
    # near-identical (not exact) clone of the query: cosine in
    # (0.92, 1) — the tight-threshold LSH variant must find BOTH this
    # and the exact duplicate (8), proving the >= 0.92 path is
    # exercised non-trivially, not just on cosine-1.0 copies
    vecs.append((31, [x + (0.002 if j % 3 == 0 else -0.002) for j, x in enumerate(base)]))
    # NULL embedding: every tier must treat it as content-free (no
    # matches, no cluster, NULL codes) without crashing a pandas UDF
    vecs.append((32, None))
    con.execute(
        "CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany(
        "INSERT INTO emb VALUES (?, ?, ?)",
        [(i, v, i % 3) for i, v in vecs],
    )
    con.execute(f"COPY emb TO '{d}/embeddings.parquet' (FORMAT parquet)")
    return str(d)


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


@pytest.mark.parametrize("name", EDGE_EMBEDDING_QUERIES)
def test_edge_embeddings_matches_oracle(spark, edge_embeddings_dir, name):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, edge_embeddings_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        [tuple(_canon(r[c]) for c in scols) for r in sdf.collect()], key=repr
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{edge_embeddings_dir}/embeddings.parquet')"
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


def test_zero_vector_excluded_everywhere(spark, edge_embeddings_dir):
    """The zero-norm vector (vec_id 7) must appear in NO similarity
    result — not as a match, not as a near-dup side."""
    for name in ("sim_cosine_topk_exact", "sim_embedding_near_dup"):
        rows = REGISTRY[name].builder(spark, edge_embeddings_dir).collect()
        for r in rows:
            assert 7 not in tuple(r)[:2], (name, r)
