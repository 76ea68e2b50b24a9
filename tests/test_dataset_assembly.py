"""Properties of the dataset-assembly tier that the differential
oracle can't express: split stability under corpus growth, shard
packing invariants, and Lloyd-step conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tijdloze_musicbrainz_spark.plans import REGISTRY
from tijdloze_musicbrainz_spark.plans.textops import (
    SHARD_TOKEN_BUDGET,
    SPLIT_TRAIN_PCT,
    SPLIT_VAL_PCT,
)


def test_split_stable_under_corpus_growth(spark, sf_dir):
    """Adding documents must never move an EXISTING source between
    splits — the group hash depends only on the source string, so the
    assignment computed on any subset agrees with the full corpus."""
    full = (
        REGISTRY["corpus_split_train_val_test"]
        .builder(spark, sf_dir)
        .select("source", "split")
        .distinct()
        .collect()
    )
    full_map = {r["source"]: r["split"] for r in full}
    # simulate the smaller, earlier corpus: first half of doc ids
    import tijdloze_musicbrainz_spark.plans.textops as textops

    docs = textops.t(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    half = docs.filter(F.col("doc_id") <= max_id // 2)
    bucket = F.expr(textops._SOURCE_HASH_SPARK) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    half_map = {
        r["source"]: r["split"]
        for r in half.select("source", split.alias("split")).distinct().collect()
    }
    for source, sp in half_map.items():
        assert full_map[source] == sp, (source, sp, full_map[source])


def test_split_percentages_sum(spark, sf_dir):
    rows = (
        REGISTRY["corpus_split_train_val_test"]
        .builder(spark, sf_dir)
        .groupBy("split")
        .count()
        .collect()
    )
    counts = {r["split"]: r["count"] for r in rows}
    assert set(counts) <= {"train", "val", "test"}
    assert counts.get("train", 0) > 0  # 80% band can't be empty


def test_shard_packing_invariants(spark, sf_dir):
    """Within a source: shard ids start at 0, are contiguous, and every
    shard except the last holds >= budget tokens while no shard except
    via a single oversized doc exceeds budget + max doc size."""
    df = REGISTRY["corpus_shard_by_token_budget"].builder(spark, sf_dir)
    rows = df.orderBy("source", "doc_id").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, docs in by_source.items():
        shards: dict[int, int] = {}
        max_doc = max(r["n_tok"] for r in docs)
        # shard id non-decreasing in doc_id order
        ids = [r["shard_in_source"] for r in docs]
        assert ids == sorted(ids), source
        for r in docs:
            shards[r["shard_in_source"]] = (
                shards.get(r["shard_in_source"], 0) + r["n_tok"]
            )
        if max_doc <= SHARD_TOKEN_BUDGET:
            # contiguity holds only when no single doc overshoots a
            # whole budget (an oversized doc legitimately skips ids:
            # floor((cum-1)/budget) jumps by more than one)
            assert min(shards) == 0, source
            assert sorted(shards) == list(range(len(shards))), source
        last = max(shards)
        for sid, tok in shards.items():
            if sid != last and max_doc <= SHARD_TOKEN_BUDGET:
                # a shard closes only once the running total crosses
                # its budget boundary
                assert tok + max_doc >= SHARD_TOKEN_BUDGET, (source, sid, tok)
            assert tok <= SHARD_TOKEN_BUDGET + max_doc, (source, sid, tok)


def test_kmeans_lloyd_conservation(spark, sf_dir):
    """Every vector lands in exactly one cluster: per-centroid member
    counts are constant across the 64 dimensions and sum to the corpus
    size; components stay inside [-1, 1] bounds of the input space."""
    df = REGISTRY["ml_kmeans_lloyd_step"].builder(spark, sf_dir)
    rows = df.collect()
    from tijdloze_musicbrainz_spark.plans.util import t as load

    n_vecs = load(spark, sf_dir, "embeddings").count()
    by_cent: dict[int, set] = {}
    for r in rows:
        by_cent.setdefault(r["cent_id"], set()).add(r["n_members"])
    assert all(len(s) == 1 for s in by_cent.values())
    assert sum(next(iter(s)) for s in by_cent.values()) == n_vecs
    lo = min(r["centroid_component"] for r in rows)
    hi = max(r["centroid_component"] for r in rows)
    assert -1.0 <= lo <= hi <= 1.0


def test_pack_sequences_next_fit_invariants(spark, sf_dir):
    """Next-fit packing: per source, sequence ids are 0-contiguous and
    non-decreasing in doc_id order; every sequence's token total fits
    the budget unless it is a single oversized document; and a doc
    that OPENS a new sequence genuinely did not fit the previous one
    (the greedy property that distinguishes next-fit from sharding)."""
    from tijdloze_musicbrainz_spark.plans.textops import PACK_TOKEN_BUDGET

    df = REGISTRY["corpus_pack_sequences"].builder(spark, sf_dir)
    rows = df.orderBy("source", "doc_id").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert by_source, "no rows"
    for source, docs in by_source.items():
        ids = [r["seq_in_source"] for r in docs]
        assert ids == sorted(ids), source
        assert ids[0] == 0, source
        assert sorted(set(ids)) == list(range(len(set(ids)))), source
        fills: dict[int, int] = {}
        counts: dict[int, int] = {}
        for r in docs:
            fills[r["seq_in_source"]] = fills.get(r["seq_in_source"], 0) + r["n_tok"]
            counts[r["seq_in_source"]] = counts.get(r["seq_in_source"], 0) + 1
        for sid, tok in fills.items():
            assert tok <= PACK_TOKEN_BUDGET or counts[sid] == 1, (source, sid, tok)
        # greedy: the first doc of sequence k did not fit in sequence k-1
        for prev, cur in zip(docs, docs[1:]):
            if cur["seq_in_source"] != prev["seq_in_source"]:
                assert (
                    fills[prev["seq_in_source"]] + cur["n_tok"] > PACK_TOKEN_BUDGET
                ), (source, cur["doc_id"])


def test_exact_substring_spans_model_check(spark, sf_dir):
    """Model-based check of the exact-substring pass: a direct Python
    recomputation (dict of gram occurrences -> duplicated positions ->
    interval union) must agree with the distributed plan on every
    document — a third implementation independent of both the Spark
    fold and the DuckDB window formulation."""
    import duckdb as _duck

    from tijdloze_musicbrainz_spark.plans.dedup import K_SPAN

    docs = _duck.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    occurrences: dict[tuple, int] = {}
    per_doc: dict[int, list] = {}
    for doc_id, text in docs:
        tk = [w for w in text.split(" ") if w]
        grams = [tuple(tk[i : i + K_SPAN]) for i in range(len(tk) - K_SPAN + 1)]
        per_doc[doc_id] = grams
        for g in grams:
            occurrences[g] = occurrences.get(g, 0) + 1
    expected = {}
    for doc_id, grams in per_doc.items():
        pos = [i for i, g in enumerate(grams) if occurrences[g] >= 2]
        covered: set[int] = set()
        spans = 0
        prev_end = -2
        for p in pos:
            covered.update(range(p, p + K_SPAN))
            if p > prev_end + 1:
                spans += 1
            prev_end = max(prev_end, p + K_SPAN - 1)
        expected[doc_id] = (len(pos), spans, len(covered))
    got = {
        r["doc_id"]: (r["n_dup_grams"], r["n_spans"], r["dup_tokens"])
        for r in REGISTRY["dedup_exact_substring_spans"].builder(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    bad = {d: (got[d], expected[d]) for d in got if got[d] != expected[d]}
    assert not bad, dict(list(bad.items())[:5])


def test_chunk_overlap_coverage(spark, sf_dir):
    """Chunking invariants: starts advance by exactly the stride,
    chunk ids are 0-contiguous, every chunk except a doc's last is
    full-size, and the last chunk reaches the final token — i.e. the
    chunks COVER the document with the configured overlap."""
    from tijdloze_musicbrainz_spark.plans.textops import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    df = REGISTRY["corpus_chunk_overlap"].builder(spark, sf_dir)
    docs = {}
    for r in df.collect():
        docs.setdefault(r["doc_id"], []).append(r)
    assert docs
    for doc_id, chunks in docs.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        ids = [c["chunk_id"] for c in chunks]
        assert ids == list(range(len(chunks))), doc_id
        for c in chunks:
            assert c["start_tok"] == c["chunk_id"] * CHUNK_STRIDE, doc_id
            assert 0 < c["chunk_len"] <= CHUNK_TOKENS, doc_id
        for c in chunks[:-1]:
            assert c["chunk_len"] == CHUNK_TOKENS, doc_id
        last = chunks[-1]
        n_tok = last["start_tok"] + last["chunk_len"]
        # the doc would need one more chunk iff tokens remain past the
        # last chunk's end — i.e. coverage is tight
        if len(chunks) > 1:
            assert n_tok > (len(chunks) - 1) * CHUNK_STRIDE, doc_id
        assert n_tok <= (len(chunks) - 1) * CHUNK_STRIDE + CHUNK_TOKENS, doc_id


def test_exact_substring_cut_model_check(spark, sf_dir):
    """Model-based check of the removal pass: a direct Python
    recomputation (winner = globally minimal (doc_id, pos) per
    duplicated gram; cut = union of loser spans; cleaned text md5)
    must agree with the distributed plan on every document."""
    import duckdb as _duck
    import hashlib

    from tijdloze_musicbrainz_spark.plans.dedup import K_SPAN

    docs = _duck.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    occ: dict[tuple, list] = {}
    toks: dict[int, list] = {}
    for doc_id, text in docs:
        tk = [w for w in text.split(" ") if w]
        toks[doc_id] = tk
        for i in range(len(tk) - K_SPAN + 1):
            occ.setdefault(tuple(tk[i : i + K_SPAN]), []).append((doc_id, i))
    losers: dict[int, list] = {}
    for g, places in occ.items():
        if len(places) >= 2:
            win = min(places)
            for d, p in places:
                if (d, p) != win:
                    losers.setdefault(d, []).append(p)
    expected = {}
    for doc_id, tk in toks.items():
        cut: set[int] = set()
        for p in losers.get(doc_id, []):
            cut.update(range(p, p + K_SPAN))
        kept = [w for i, w in enumerate(tk) if i not in cut]
        expected[doc_id] = (
            len(kept),
            len(tk) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    got = {
        r["doc_id"]: (r["kept_tok"], r["cut_tok"], r["kept_digest"])
        for r in REGISTRY["dedup_exact_substring_cut"].builder(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    bad = {d: (got[d], expected[d]) for d in got if got[d] != expected[d]}
    assert not bad, dict(list(bad.items())[:5])


def test_interval_union_fold_randomized(spark):
    """The in-row interval-union fold (shared shape of the spans and
    cut queries) against a brute-force Python union on randomized
    position lists — batched as ONE DataFrame so Spark overhead stays
    sane. Covers empties, duplicates-free sorted lists, adjacency at
    every offset, and position 0 (the sentinel-end=-2 edge)."""
    import random

    from pyspark.sql import functions as F

    from tijdloze_musicbrainz_spark.plans.dedup import K_SPAN

    rng = random.Random(20260814)
    cases = [[]] + [
        sorted(rng.sample(range(0, 40), rng.randint(1, 12)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, ps) for i, ps in enumerate(cases)], "case_id int, ps array<int>"
    )
    fold = F.expr(
        f"""
aggregate(ps,
  named_struct('end', CAST(-2 AS BIGINT), 'spans', 0L, 'covered', 0L),
  (acc, p) -> named_struct(
    'end', greatest(acc.end, CAST(p AS BIGINT) + {K_SPAN - 1}),
    'spans', acc.spans + IF(CAST(p AS BIGINT) > acc.end + 1, 1L, 0L),
    'covered', acc.covered + greatest(0L,
      CAST(p AS BIGINT) + {K_SPAN}
        - greatest(acc.end + 1, CAST(p AS BIGINT)))),
  acc -> named_struct('spans', acc.spans, 'covered', acc.covered))
"""
    )
    got = {
        r["case_id"]: (r["f"]["spans"], r["f"]["covered"])
        for r in df.select("case_id", fold.alias("f")).collect()
    }
    for i, ps in enumerate(cases):
        covered: set[int] = set()
        spans = 0
        prev_end = -2
        for p in ps:
            covered.update(range(p, p + K_SPAN))
            if p > prev_end + 1:
                spans += 1
            prev_end = max(prev_end, p + K_SPAN - 1)
        assert got[i] == (spans, len(covered)), (i, ps, got[i])


def test_next_fit_kernel_randomized():
    """The numpy next-fit kernel vs a sequential reference, including
    oversized docs (> budget) — a branch no testdata document reaches
    through the registered query."""
    import random

    from tijdloze_musicbrainz_spark.plans.textops import next_fit_bins

    rng = random.Random(42)
    for trial in range(300):
        budget = rng.choice([1, 5, 17, 64])
        n = [rng.choice([0, 1, 2, 3, budget - 1, budget, budget + 1,
                         rng.randint(0, 3 * budget)])
             for _ in range(rng.randint(0, 25))]
        # sequential next-fit reference
        ref, fill, bin_id = [], 0, 0
        first = True
        for x in n:
            if not first and fill + x > budget:
                bin_id += 1
                fill = x
            else:
                fill += x
            first = False
            ref.append(bin_id)
        got = list(next_fit_bins(n, budget))
        assert got == ref, (trial, budget, n, got, ref)


def test_pack_nested_kernel_matches_module_kernel(spark, sf_dir):
    """The builder's nested (closure-self-contained) next-fit copy and
    the module-level next_fit_bins must agree — the duplication exists
    only because a module-referencing UDF closure cannot unpickle on
    workers when the driver runs outside the repo."""
    import numpy as np

    from tijdloze_musicbrainz_spark.plans.textops import (
        PACK_TOKEN_BUDGET,
        next_fit_bins,
    )

    rows = (
        REGISTRY["corpus_pack_sequences"]
        .builder(spark, sf_dir)
        .orderBy("source", "doc_id")
        .collect()
    )
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, docs in by_source.items():
        n = np.array([r["n_tok"] for r in docs], dtype=np.int64)
        expect = list(next_fit_bins(n, PACK_TOKEN_BUDGET))
        got = [r["seq_in_source"] for r in docs]
        assert got == expect, source


def test_pack_streamed_fold_equals_single_frame_across_batches(spark):
    """r11 verdict item 5 (the de-ceilinged pack): the streaming
    mapInPandas fold must produce bit-identical bins to folding each
    source in one frame, INCLUDING when sources span many Arrow
    batches. Force 7-row batches over corpora with zero-token docs,
    oversized docs, and exact-fit docs planted at batch boundaries,
    plus several interleaved sources — every carry transition
    (open-bin continue, open-bin close-on-overflow, forced oversized
    singleton after a carried bin, zero-token-only open bin) is
    crossed."""
    import numpy as np

    from tijdloze_musicbrainz_spark.plans.textops import (
        next_fit_bins,
        pack_sequences_streamed,
    )

    budget = 10
    rng = np.random.default_rng(7)
    corpora = []
    # adversarial hand-built: oversized at batch edges, zero runs,
    # exact fills
    corpora.append(
        [("a", [3, 3, 3, 3, 25, 0, 0, 1, 10, 10, 0, 25, 25, 2, 8, 1])]
    )
    corpora.append(
        [
            ("a", [0] * 9 + [12] + [0] * 9 + [5, 5, 5]),
            ("b", [10] * 8 + [1]),
            ("c", [1] * 30),
        ]
    )
    # randomized: three sources, sizes mixing 0, tiny, oversized
    for _ in range(3):
        corpora.append(
            [
                (s, rng.choice([0, 1, 2, 3, 9, 10, 11, 30], size=41).tolist())
                for s in ("x", "y", "z")
            ]
        )

    old_bs = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        for corpus in corpora:
            rows = [
                (i + 1000 * si, src, int(tok))
                for si, (src, toks) in enumerate(corpus)
                for i, tok in enumerate(toks)
            ]
            sized = spark.createDataFrame(
                rows, "doc_id long, source string, n_tok long"
            )
            got = {
                (r["source"], r["doc_id"]): r["seq_in_source"]
                for r in pack_sequences_streamed(sized, budget).collect()
            }
            for si, (src, toks) in enumerate(corpus):
                expect = next_fit_bins(np.array(toks, np.int64), budget)
                for i, e in enumerate(expect):
                    assert got[(src, i + 1000 * si)] == e, (
                        src, i, toks, [got[(src, k + 1000 * si)] for k in range(len(toks))], list(expect),
                    )
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old_bs
        )
