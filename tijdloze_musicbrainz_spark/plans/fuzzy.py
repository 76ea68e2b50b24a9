"""The fuzzy two-phase search pipeline — the reference's entire
user-facing read path (``/root/reference/src/benchmark.py:69-142``),
re-expressed set-oriented:

reference (per query row, client-side loops)      here (one Spark job)
----------------------------------------------    ----------------------------
search_artist: levenshtein<=1 vs alias table      deletion-neighborhood join
phase 1: alias LIKE '<key>%'                      equi-join(artist) + prefix
"if 0 rows" client-side fallback                  anti-join the remainder
phase 2: levenshtein<=1                           equi-join(artist) + bounded
                                                  levenshtein post-filter
threshold + argmax re-rank (:128-133)             window max + min_by argmin
duet "&" split fallback (:176-183)                split_part + same resolve

Scale design (the part the reference never needed, single query at a
time):

- **No cross joins anywhere.** The fuzzy artist resolve uses a
  SymSpell-style *deletion neighborhood*: every key expands to its
  <= (len+1) single-character-deletion variants; both sides explode
  and equi-join on the variant, then verify with true bounded
  levenshtein. Distance<=1 pairs always share a variant, so this is
  exact — and it is a plain shuffled equi-join that scales linearly
  and AQE-skew-splits, instead of an O(N*M) nested loop.
- Phase-2 fuzzy song match already carries the artist equi-key, so it
  is an equi-join with a cheap bounded-levenshtein residual.
- The re-rank is argmin-by-struct aggregation (map-side combinable),
  not a window, so one viral query key cannot serialize a task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.normalize import search_key, search_key_sql
from ..operators.canonical import argmin_per_group
from .registry import REGISTRY, register
from .util import t

# ---------------------------------------------------------------------------
# Library operators
# ---------------------------------------------------------------------------


def deletion_variants(key: Column | str) -> Column:
    """The string plus every single-character deletion of it (array,
    deduplicated) — the distance-1 SymSpell neighborhood. Two strings
    with levenshtein distance <= 1 ALWAYS share at least one variant,
    so an equi-join on the exploded variant is a complete candidate
    generator for a bounded-distance join. Pure JVM expressions; a
    ``str`` argument (SQL expression snippet) parses as ONE F.expr —
    the Column composition costs ~25 py4j round trips per call."""
    if isinstance(key, str):
        k = key
        return F.expr(
            f"array_union(array({k}), "
            f"transform(sequence(1, greatest(length({k}), 1)), "
            f"i -> concat(substring({k}, 1, i - 1), "
            f"substring({k}, i + 1, length({k}) - i))))"
        )
    idx = F.sequence(F.lit(1), F.greatest(F.length(key), F.lit(1)))
    dels = F.transform(
        idx,
        lambda i: F.concat(
            F.substring(key, F.lit(1), i - F.lit(1)),
            F.substring(key, i + F.lit(1), F.length(key) - i),
        ),
    )
    return F.array_union(F.array(key), dels)


def fuzzy_key_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    length_guard: int = 255,
) -> DataFrame:
    """Bounded-distance (<=1) join on normalized keys without a cross
    join: explode deletion variants on both sides, equi-join on the
    variant, de-duplicate the candidate pairs, verify with the
    early-exit threshold form of levenshtein.

    Cost model at scale: rows multiply by ~(key_len+1) map-side, then
    one hash-shuffle on the variant string. Verification is O(k) per
    candidate with the threshold=1 early exit. Mirrors the reference's
    ``levenshtein_less_equal(alias, q, 1) < 2`` predicate
    (src/benchmark.py:77,90) including the LENGTH guard (:76)."""
    lv = left.withColumn("__v", F.explode(deletion_variants(left_key)))
    rv = right.withColumn("__v", F.explode(deletion_variants(right_key)))
    pairs = lv.join(rv, "__v").drop("__v").distinct()
    return pairs.filter(
        (F.length(F.col(right_key)) < length_guard)
        & (F.levenshtein(F.col(left_key), F.col(right_key), 1) >= 0)
    )


# ---------------------------------------------------------------------------
# Testdata-shaped fixtures: songs catalog + query workload
# (shared by the registered fuzzy queries and their DuckDB oracles)
# ---------------------------------------------------------------------------


def _songs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Song-catalog analog on TPC-H-ish tables: one row per
    (part, supplier) pair — part plays "song", supplier plays
    "artist", recording_score = #lineitems, release_year = first order
    year, deterministic arithmetic flags for single-from/main-album."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    orders = t(spark, sf_dir, "orders")
    # Aggregate BEFORE attaching the name (guide §2.3): p_name is
    # functionally determined by p_partkey (one part row per key), so
    # min(p_name) inside the big aggregate only "selected" the unique
    # name — at the price of a string agg buffer, which forces the
    # whole 600k-row pre-agg into SortAggregate (HashAggregate needs
    # mutable primitive buffers). Keeping the aggregate primitive-only
    # (count + min(year)) restores the hash aggregate with map-side
    # partial combine, and part joins the ~|parts x suppliers| POST-agg
    # rows instead of riding every lineitem. min(p_name) == p_name by
    # uniqueness, so results are identical and the oracle is unchanged.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("song_id"),
            F.col("l_suppkey").alias("artist_id"),
        )
        .agg(
            F.count("*").alias("recording_score"),
            F.min(F.year("o_orderdate")).cast("long").alias("release_year"),
        )
        .join(part, F.col("song_id") == part.p_partkey)
        .select(
            "song_id",
            "artist_id",
            F.col("p_name").alias("title"),
            "recording_score",
            "release_year",
        )
        .withColumn("alias_key", search_key("title"))
        .withColumn("is_single_from", F.col("song_id") % 7 == 0)
        .withColumn("is_main_album", F.col("song_id") % 3 == 0)
    )


_SONGS_SQL = f"""
songs AS (
  SELECT l.l_partkey AS song_id, l.l_suppkey AS artist_id,
         min(p.p_name) AS title,
         CAST(count(*) AS BIGINT) AS recording_score,
         CAST(min(year(o.o_orderdate)) AS BIGINT) AS release_year,
         {search_key_sql('min(p.p_name)')} AS alias_key,
         (l.l_partkey % 7 = 0) AS is_single_from,
         (l.l_partkey % 3 = 0) AS is_main_album
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_partkey, l.l_suppkey
)"""


def _queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic query workload derived from the data itself:
    every 10th supplier asks for its min-partkey part. qid%40==0 →
    truncated title (exercises the phase-1 PREFIX match), else
    qid%20==0 → one-char typo in title AND artist (exercises the
    phase-2 fuzzy fallback and fuzzy artist resolve), else exact."""
    supp = t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 10 == 0)
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    qpart = li.groupBy("l_suppkey").agg(F.min("l_partkey").alias("qpart"))
    qid = F.col("s_suppkey")
    return (
        supp.join(qpart, supp.s_suppkey == qpart.l_suppkey)
        .join(part, qpart.qpart == part.p_partkey)
        .select(
            qid.alias("qid"),
            F.when(
                (qid % 20 == 0) & ~(qid % 40 == 0),
                F.expr("substring(s_name, 1, length(s_name)-1)"),
            )
            .otherwise(F.col("s_name"))
            .alias("artist_q"),
            F.when(qid % 40 == 0, F.expr("substring(p_name, 1, 8)"))
            .when(qid % 20 == 0, F.concat(F.col("p_name"), F.lit("x")))
            .otherwise(F.col("p_name"))
            .alias("title_q"),
        )
        .withColumn("artist_key", search_key("artist_q"))
        .withColumn("title_key", search_key("title_q"))
    )


_QUERIES_SQL = f"""
queries AS (
  SELECT s.s_suppkey AS qid,
         CASE WHEN s.s_suppkey % 20 = 0 AND NOT s.s_suppkey % 40 = 0
              THEN substring(s.s_name, 1, length(s.s_name)-1)
              ELSE s.s_name END AS artist_q,
         CASE WHEN s.s_suppkey % 40 = 0 THEN substring(p.p_name, 1, 8)
              WHEN s.s_suppkey % 20 = 0 THEN p.p_name || 'x'
              ELSE p.p_name END AS title_q
  FROM supplier s
  JOIN (SELECT l_suppkey, min(l_partkey) AS qpart
        FROM lineitem GROUP BY l_suppkey) q ON q.l_suppkey = s.s_suppkey
  JOIN part p ON p.p_partkey = q.qpart
  WHERE s.s_suppkey % 10 = 0
),
qk AS (
  SELECT qid, {search_key_sql('artist_q')} AS artist_key,
         {search_key_sql('title_q')} AS title_key
  FROM queries
)"""


def _resolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy artist resolution (src/benchmark.py:69-79): DISTINCT
    artist ids whose alias key is within edit distance 1 of the query
    artist key."""
    queries = _queries(spark, sf_dir).select("qid", "artist_key", "title_key")
    aliases = (
        t(spark, sf_dir, "supplier")
        .select(
            F.col("s_suppkey").alias("artist_id"),
            search_key("s_name").alias("akey"),
        )
    )
    return (
        fuzzy_key_join(queries, aliases, "artist_key", "akey")
        .select("qid", "title_key", "artist_id")
        .distinct()
    )


_RESOLVED_SQL = f"""
resolved AS (
  SELECT DISTINCT q.qid, q.title_key, a.s_suppkey AS artist_id
  FROM qk q
  JOIN supplier a
    ON length({search_key_sql('a.s_name')}) < 255
   AND levenshtein(q.artist_key, {search_key_sql('a.s_name')}) <= 1
)"""


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "fuzzy_artist_resolve",
    survey_ids=("P7", "P8", "F5", "J11"),
    oracle=f"""
WITH {_QUERIES_SQL.lstrip()},
{_RESOLVED_SQL.lstrip()}
SELECT qid, artist_id FROM resolved
""",
    doc="Fuzzy artist resolution (src/benchmark.py:69-79) as a "
    "deletion-neighborhood equi-join + bounded levenshtein verify — "
    "no cross join at any scale.",
)
def fuzzy_artist_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _resolved(spark, sf_dir).select("qid", "artist_id")


@register(
    "fuzzy_two_phase_search",
    survey_ids=("P6", "P7", "P8", "F5", "F9", "A9", "J9", "SET3", "O4"),
    oracle=f"""
WITH {_SONGS_SQL.lstrip()},
{_QUERIES_SQL.lstrip()},
{_RESOLVED_SQL.lstrip()},
p1 AS (
  SELECT r.qid, r.title_key, s.*, 1 AS phase
  FROM resolved r JOIN songs s ON s.artist_id = r.artist_id
  WHERE s.alias_key LIKE r.title_key || '%'
),
p2 AS (
  SELECT r.qid, r.title_key, s.*, 2 AS phase
  FROM resolved r JOIN songs s ON s.artist_id = r.artist_id
  WHERE r.qid NOT IN (SELECT qid FROM p1)
    AND length(s.alias_key) < 255
    AND levenshtein(r.title_key, s.alias_key) <= 1
),
cand AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2),
scored AS (
  SELECT *,
         CAST(recording_score AS DOUBLE)
         * CASE WHEN is_single_from THEN 10 ELSE 1 END
         * CASE WHEN is_main_album THEN 10 ELSE 1 END
         * CASE WHEN alias_key = title_key THEN 10 ELSE 1 END AS relevance
  FROM cand
),
thresholded AS (
  SELECT * FROM (
    SELECT *, max(relevance) OVER (PARTITION BY qid) AS max_rel FROM scored
  ) WHERE relevance >= max_rel / 10
)
SELECT qid, song_id, artist_id, title, release_year,
       CAST(phase AS BIGINT) AS phase, round(relevance, 2) AS relevance
FROM thresholded
QUALIFY row_number() OVER (
  PARTITION BY qid ORDER BY release_year, relevance DESC, song_id, artist_id) = 1
""",
    doc="The reference's complete read path (src/benchmark.py:81-142): "
    "fuzzy artist resolve -> phase-1 prefix join -> anti-join the "
    "unmatched remainder -> phase-2 bounded-levenshtein join -> union "
    "-> multiplicative relevance -> threshold max/10 -> earliest-year "
    "argmax, set-oriented end to end.",
)
def fuzzy_two_phase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _search_over(_songs(spark, sf_dir), _resolved(spark, sf_dir))


def _search_over(songs: DataFrame, resolved: DataFrame) -> DataFrame:
    """The two-phase search given a song catalog and a resolved query
    set (shared by the build-inline and precomputed-catalog variants)."""
    # resolved is |workload|-sized (queries x matched artists), tiny
    # next to the song catalog: broadcast it so the catalog — the
    # 100 TB side — is never shuffled for this join.
    return rank_candidates(songs.join(F.broadcast(resolved), "artist_id"))


def score_candidates(joined: DataFrame) -> DataFrame:
    """Phase gating + relevance over a (query x candidate-song) join —
    the scoring stage of the reference read path BEFORE the threshold
    and argmin (src/benchmark.py:96-126). Shared by rank_candidates
    and the candidates-for-one-key debug view (the reference's
    --recording_id dump, src/main.py:235-247).

    One pass over the join instead of three: keep rows matching EITHER
    phase predicate, then realize the reference's "phase 2 only if
    phase 1 found nothing" (src/benchmark.py:121-126) with a per-query
    window flag — the anti-join formulation re-evaluated the whole
    songs subtree two extra times."""
    is_p1 = F.col("alias_key").startswith(F.col("title_key"))
    is_p2 = (F.length("alias_key") < 255) & (
        F.levenshtein(F.col("title_key"), F.col("alias_key"), 1) >= 0
    )
    matched = joined.filter(is_p1 | is_p2).withColumn("__is_p1", is_p1)
    has_p1 = F.max(F.col("__is_p1").cast("int")).over(Window.partitionBy("qid"))
    cand = (
        matched.withColumn("__has_p1", has_p1)
        .filter(F.col("__is_p1") | (F.col("__has_p1") == 0))
        .withColumn("phase", F.when(F.col("__is_p1"), 1).otherwise(2))
        .drop("__is_p1", "__has_p1")
    )
    boost = lambda flag: F.when(flag, F.lit(10.0)).otherwise(F.lit(1.0))  # noqa: E731
    return cand.withColumn(
        "relevance",
        F.col("recording_score").cast("double")
        * boost(F.col("is_single_from"))
        * boost(F.col("is_main_album"))
        * boost(F.col("alias_key") == F.col("title_key")),
    )


def rank_candidates(joined: DataFrame) -> DataFrame:
    """Phase gating + relevance + threshold + argmin over an already
    joined (query x candidate-song) frame — the tail of the reference
    read path (src/benchmark.py:96-142). Shared by _search_over and the
    real-CSV closed-loop benchmark (benchmark_real.py), whose candidate
    generation adds the second-artist duet condition before this stage.

    ``joined`` needs: qid, title_key, alias_key, recording_score,
    is_single_from, is_main_album, song_id, artist_id, title,
    release_year."""
    scored = score_candidates(joined)
    thresholded = scored.withColumn(
        "max_rel", F.max("relevance").over(Window.partitionBy("qid"))
    ).filter(F.col("relevance") >= F.col("max_rel") / 10)

    ranked = thresholded.select(
        "qid",
        "song_id",
        "artist_id",
        "title",
        "release_year",
        F.col("phase").cast("long").alias("phase"),
        F.round("relevance", 2).alias("relevance"),
        (-F.col("relevance")).alias("neg_rel"),
    )
    return argmin_per_group(
        ranked, ["qid"], ["release_year", "neg_rel", "song_id", "artist_id"]
    ).drop("neg_rel")


@register(
    "fuzzy_duet_split_resolve",
    survey_ids=("F11", "F10", "P8"),
    oracle=f"""
WITH duet AS (
  SELECT s1.s_suppkey AS qid,
         s1.s_name || ' & ' || s2.s_name AS artist_q
  FROM supplier s1 JOIN supplier s2 ON s2.s_suppkey = s1.s_suppkey + 1
  WHERE s1.s_suppkey % 25 = 0
),
split AS (
  SELECT qid,
         {search_key_sql("split_part(artist_q, '&', 1)")} AS main_key,
         {search_key_sql("array_to_string(list_slice(string_split(artist_q, '&'), 2, 99), '&')")} AS second_key
  FROM duet
)
SELECT DISTINCT d.qid, m.s_suppkey AS main_artist_id, s.s_suppkey AS second_artist_id
FROM split d
JOIN supplier m ON levenshtein(d.main_key, {search_key_sql('m.s_name')}) <= 1
JOIN supplier s ON levenshtein(d.second_key, {search_key_sql('s.s_name')}) <= 1
""",
    doc='Duet "&"-split fallback (src/benchmark.py:176-183): when the '
    "combined name resolves nothing, split on '&', resolve main and "
    "second artist independently (split_part / slice-join mirrors "
    "the reference's split[0] / '&'.join(split[1:])).",
)
def fuzzy_duet_split_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = t(spark, sf_dir, "supplier")
    s1 = supp.alias("s1")
    s2 = supp.alias("s2")
    duet = (
        s1.filter(F.col("s1.s_suppkey") % 25 == 0)
        .join(s2, F.col("s2.s_suppkey") == F.col("s1.s_suppkey") + 1)
        .select(
            F.col("s1.s_suppkey").alias("qid"),
            F.concat_ws(" & ", F.col("s1.s_name"), F.col("s2.s_name")).alias(
                "artist_q"
            ),
        )
    )
    parts = F.split(F.col("artist_q"), "&")
    split = duet.select(
        "qid",
        search_key("element_at(split(artist_q, '&'), 1)").alias("main_key"),
        search_key(
            "array_join(slice(split(artist_q, '&'), 2, 99), '&')"
        ).alias("second_key"),
    )
    aliases = supp.select(
        F.col("s_suppkey").alias("artist_id"),
        search_key("s_name").alias("akey"),
    )
    main = (
        fuzzy_key_join(split, aliases, "main_key", "akey")
        .select("qid", "second_key", F.col("artist_id").alias("main_artist_id"))
    )
    both = (
        fuzzy_key_join(main, aliases, "second_key", "akey")
        .select("qid", "main_artist_id", F.col("artist_id").alias("second_artist_id"))
        .distinct()
    )
    return both


@register(
    "fuzzy_search_precomputed",
    survey_ids=("P6", "P7", "P8", "F5", "F9", "A9", "O4"),
    oracle=REGISTRY["fuzzy_two_phase_search"].oracle,
    doc="The reference's ACTUAL read-path economics: the song catalog "
    "and alias keys are materialized once (the export-table pattern, "
    "sql/4:32 / sql/5:34) and the interactive two-phase search runs "
    "against the materialization — same oracle, same results as "
    "fuzzy_two_phase_search, but the measured cost is query-time "
    "only. bench.py carries both so the catalog-build vs query split "
    "is visible.",
)
def fuzzy_search_precomputed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.materialize import materialized  # noqa: PLC0415

    songs = materialized(
        spark, sf_dir, "song_catalog", lambda: _songs(spark, sf_dir)
    )
    resolved = _resolved(spark, sf_dir)
    return _search_over(songs, resolved)
