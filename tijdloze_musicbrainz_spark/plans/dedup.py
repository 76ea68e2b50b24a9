"""Deduplication operators over the ``documents`` table — the
training-data-pipeline extension surface (BASELINE.json north star;
no reference twin, the reference ends at relational dedup A10/S8).

Three tiers, each a registered query:

1. **Exact** (``dedup_exact_first_wins``): group by the normalized
   text itself, first-writer-wins (min doc_id) — one hash shuffle on
   the dedup key. At 100 TB you'd group on ``xxhash64(text)`` +
   resolve rare collisions, but grouping on the key column keeps the
   DuckDB oracle engine-neutral; the plan shape (single hash
   aggregate) is identical.
2. **Blocked n-gram Jaccard** (``dedup_ngram_jaccard_blocked``):
   3-word-shingle Jaccard >= 0.9 within cheap blocks (first-5-words
   key). Fully SQL-expressible → exact differential oracle. Recall is
   bounded by the blocker (documented); it is the classic cheap
   pre-filter before MinHash.
3. **MinHash + LSH** (``dedup_minhash_lsh``): 64-perm MinHash
   signatures, 16 bands x 4 rows, banded bucket join — NEVER
   all-pairs — then exact-Jaccard verification of bucket candidates.

LSH scale math (the 100 TB case): with n docs and b=16 bands, the
bucket join shuffles 16n (band_key, doc) rows; pairs are generated
only within buckets. False-positive candidate rate per band is
s^4 for a pair with true Jaccard s (s=0.3 → 0.8%/band), so candidate
volume stays ~O(n·dup_rate). A pair with s=0.9 is missed by all 16
bands with probability (1-0.9^4)^16 ≈ 3e-8 — at the verification
threshold 0.8 used here, recall is effectively 1, which is why the
exhaustive exact-Jaccard DuckDB oracle hash-matches the LSH plan
(tested at sf0.01 and sf0.001; if the driver data ever plants pairs
hovering exactly at the threshold, this entry degrades to rows-only).

Signatures/bands use ``xxhash64`` — JVM-side, whole-stage-codegen
friendly; zero Python UDFs in any of these plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .util import checkpointed_payload, eager_checkpoint, fan_out, t

N_PERMS = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERMS // N_BANDS

# ---------------------------------------------------------------------------
# Column helpers (all pure JVM expressions)
# ---------------------------------------------------------------------------


def words_col(text: str = "text"):
    return F.split(F.col(text), " ")


def shingles_col(ws) -> object:
    """Distinct 3-word shingles; short docs fall back to one shingle."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(ws) - 2, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(3))),
        )
    )


_SHINGLES_SQL = (
    "list_distinct(list_transform("
    "range(1, greatest(len(ws)-2, 1)+1), "
    "i -> array_to_string(list_slice(ws, i, i+2), ' ')))"
)


# Universal-hash permutation constants: h_k(x) = (a_k*x + b_k) mod P
# over the Mersenne prime P = 2^31-1. Products stay < 2^62, so ANSI
# long arithmetic cannot overflow. Seeded Python PRNG → deterministic
# across runs/sessions.
_P = 2_147_483_647


def _perm_constants() -> list[tuple[int, int]]:
    import random  # noqa: PLC0415

    rng = random.Random(42)
    return [(rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(N_PERMS)]


_PERMS = _perm_constants()


def minhash_agg_exprs() -> list:
    """64 min-hash aggregate expressions over an exploded
    (doc, shingle_hash) relation. IMPORTANT perf note: Spark's
    higher-order functions (transform/aggregate lambdas) are
    INTERPRETED, not whole-stage-codegen'd — a nested
    transform(64) x transform(#shingles) formulation of MinHash runs
    ~100x slower than this flat form, where each permutation is a
    literal-constant arithmetic expression inside a codegen'd hash
    aggregate with map-side partial min.

    r15: one ``F.expr`` SQL string per permutation instead of nested
    Column operators — the operator form cost ~8 Python->JVM round
    trips per permutation (~0.4 s of pure driver latency PER CALL,
    and lifecycle builds call this twice per run); one parse call per
    column is ~15x cheaper and the analyzed plan is value-identical
    (typed long literals vs fold-away casts)."""
    return [
        F.expr(
            f"min(pmod(pmod(xxhash64(shingle), {_P}) * {a}L + {b}L, {_P}))"
            f" as m{k}"
        )
        for k, (a, b) in enumerate(_PERMS)
    ]


def band_key_cols() -> list:
    """16 band keys from the m0..m63 signature columns: band b hashes
    its 4 slots plus the band index (buckets from different bands can
    never collide). Plain codegen expressions (one parse call per
    band — same driver-latency rationale as minhash_agg_exprs)."""
    return [
        F.expr(
            f"xxhash64({b}, "
            + ", ".join(
                f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            )
            + f") as band{b}"
        )
        for b in range(N_BANDS)
    ]


def jaccard(a, b) -> object:
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_first_wins",
    survey_ids=("A10", "S8"),
    oracle="""
SELECT lower(trim(text)) AS text_key,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY lower(trim(text))
""",
    doc="Exact dedup, first-writer-wins: one hash aggregate on the "
    "normalized text. The insert-if-absent semantics of the "
    "reference's artist upsert (src/main.py:306-313) applied to a "
    "document corpus.",
)
def dedup_exact_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.lower(F.trim(F.col("text"))).alias("text_key"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


@register(
    "dedup_ngram_jaccard_blocked",
    survey_ids=(),
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
sh AS (
  SELECT doc_id,
         array_to_string(list_slice(ws, 1, 5), ' ') AS blk,
         {_SHINGLES_SQL} AS sgs
  FROM w
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sgs, b.sgs)) * 1.0
             / len(list_distinct(list_concat(a.sgs, b.sgs))), 4) AS jaccard
FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.sgs, b.sgs)) * 1.0
      / len(list_distinct(list_concat(a.sgs, b.sgs))) >= 0.9
""",
    doc="Near-dup pairs by 3-shingle Jaccard >= 0.9 inside first-5-"
    "words blocks: an equi-join on the block key (recall bounded by "
    "the blocker — the cheap pre-LSH tier). Block sizes are bounded "
    "on this corpus; at web scale boilerplate prefixes form "
    "mega-blocks whose within-block pairing is quadratic — the capped "
    "path is dedup_ngram_jaccard_meta_blocked (explicit cap, dropped "
    "mass in the hashed result) and the recall-preserving path is "
    "the banded MinHash family (SCALE.md mega-block levers).",
)
def dedup_ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL text matches nothing: Spark's NULL-array shingle fold would
    # otherwise collapse to [''] (identical to the EMPTY document) and
    # pair contentless docs, while the oracle's NULL block key joins
    # nothing — filter keeps both engines on "no content, no pairs"
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", words_col().alias("ws"))
    )
    # the tokenize+shingle fold is the profiled CPU hotspot and the
    # self-join inlines it once per leg, single-task (one-row-group
    # scan): fan out to cluster parallelism and checkpoint so the
    # gram CPU runs ONCE and both legs read the materialized frame
    # (the exact-substring precedent, guide §2.4/§1.2); the checkpoint
    # is then sized to its measured bytes (r16) so the join legs stop
    # paying 32-task overhead on a few-MB frame
    sh, _ = checkpointed_payload(
        fan_out(docs).select(
            "doc_id",
            F.concat_ws(" ", F.slice(F.col("ws"), 1, 5)).alias("blk"),
            shingles_col(F.col("ws")).alias("sgs"),
        )
    )
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    jac = jaccard(F.col("a.sgs"), F.col("b.sgs"))
    return pairs.filter(jac >= 0.9).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(jac, 4).alias("jaccard"),
    )


# Meta-blocking caps: level-1 blocks (first token — deliberately the
# COARSE key that produces mega-blocks) above META_BLOCK_CAP members
# are re-blocked by the finer first-2-token key; sub-blocks still
# above META_SUBBLOCK_CAP are DROPPED, and the dropped mass is
# surfaced in every output row — never silently.
META_BLOCK_CAP = 16
META_SUBBLOCK_CAP = 8


@register(
    "dedup_ngram_jaccard_meta_blocked",
    survey_ids=(),
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE text IS NOT NULL
),
sh AS (
  SELECT doc_id, ws[1] AS blk1,
         array_to_string(list_slice(ws, 1, 2), ' ') AS blk2,
         {_SHINGLES_SQL} AS sgs
  FROM w
),
b1 AS (SELECT blk1, count(*) AS c FROM sh GROUP BY blk1),
kept1 AS (
  SELECT s.doc_id, '1|' || s.blk1 AS blk, s.sgs
  FROM sh s JOIN b1 USING (blk1) WHERE b1.c <= {META_BLOCK_CAP}
),
over1 AS (
  SELECT s.* FROM sh s JOIN b1 USING (blk1) WHERE b1.c > {META_BLOCK_CAP}
),
b2 AS (SELECT blk2, count(*) AS c FROM over1 GROUP BY blk2),
kept2 AS (
  SELECT o.doc_id, '2|' || o.blk2 AS blk, o.sgs
  FROM over1 o JOIN b2 USING (blk2) WHERE b2.c <= {META_SUBBLOCK_CAP}
),
units AS (SELECT * FROM kept1 UNION ALL SELECT * FROM kept2),
acct AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM b1
          WHERE c > {META_BLOCK_CAP}) AS n_blocks_reblocked,
         (SELECT CAST(count(*) AS BIGINT) FROM b2
          WHERE c > {META_SUBBLOCK_CAP}) AS n_subblocks_dropped,
         (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM b2
          WHERE c > {META_SUBBLOCK_CAP}) AS n_docs_dropped
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sgs, b.sgs)) * 1.0
             / len(list_distinct(list_concat(a.sgs, b.sgs))), 4) AS jaccard,
       acct.n_blocks_reblocked, acct.n_subblocks_dropped,
       acct.n_docs_dropped
FROM units a JOIN units b ON a.blk = b.blk AND a.doc_id < b.doc_id
CROSS JOIN acct
WHERE len(list_intersect(a.sgs, b.sgs)) * 1.0
      / len(list_distinct(list_concat(a.sgs, b.sgs))) >= 0.9
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(NULL AS DOUBLE),
       acct.n_blocks_reblocked, acct.n_subblocks_dropped,
       acct.n_docs_dropped
FROM acct
""",
    doc="META-BLOCKING with an EXPLICIT cap (Papadakis et al.'s "
    "block-purging/refinement family) — the executable form of "
    "SCALE.md's mega-block lever 3: the deliberately COARSE first-"
    "token block key concentrates boilerplate into mega-blocks "
    "(every block at sf0.1 exceeds the cap — the web-scale shape); "
    "blocks above META_BLOCK_CAP=16 members are RE-BLOCKED by the "
    "finer first-2-token key instead of paired quadratically, and "
    "sub-blocks still above META_SUBBLOCK_CAP=8 are DROPPED — with "
    "the dropped mass surfaced on every output row AND on one "
    "always-present sentinel accounting row (doc_a = doc_b = -1, "
    "jaccard NULL — mirrored exactly in the oracle), so the counters "
    "reach the driver-hashed result even when NO pair clears the 0.9 "
    "threshold; without the sentinel an empty pair set would hide "
    "the drops entirely (r12 ADVICE) "
    "(n_blocks_reblocked / n_subblocks_dropped / n_docs_dropped; "
    "at sf0.1 that reads 30 mega-blocks re-blocked, 102 "
    "sub-blocks dropped, 1019 docs excluded). Within-unit pairing "
    "fan-out is bounded by cap^2 per key, so the plan has NO "
    "quadratic mega-block stage at any scale — the property the "
    "uncapped sibling dedup_ngram_jaccard_blocked deliberately does "
    "not have (its exact-recall oracle is the contract there; its "
    "docstring points scale users here and at the banded MinHash "
    "path). Unit keys are namespaced ('1|'/'2|') so a one-token "
    "document's level-2 key can never collide with a level-1 block. "
    "Verification is the same exact Jaccard >= 0.9.",
)
def dedup_ngram_jaccard_meta_blocked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", words_col().alias("ws"))
    )
    # sh is consumed by FIVE subtrees (b1, kept1, over1->b2/kept2, and
    # the two bounded accounting actions) — without a checkpoint each
    # one re-runs the single-task shingle fold; fanned out + pinned
    # once (same rationale as dedup_ngram_jaccard_blocked), sized to
    # its measured bytes (r16)
    sh, _ = checkpointed_payload(
        fan_out(docs).select(
            "doc_id",
            F.element_at(F.col("ws"), 1).alias("blk1"),
            F.concat_ws(" ", F.slice(F.col("ws"), 1, 2)).alias("blk2"),
            shingles_col(F.col("ws")).alias("sgs"),
        )
    )
    b1 = sh.groupBy("blk1").agg(F.count("*").alias("c"))
    kept1 = (
        sh.join(b1.filter(F.col("c") <= META_BLOCK_CAP), "blk1")
        .select("doc_id", F.concat(F.lit("1|"), F.col("blk1")).alias("blk"), "sgs")
    )
    over1 = sh.join(b1.filter(F.col("c") > META_BLOCK_CAP), "blk1").select(
        "doc_id", "blk2", "sgs"
    )
    b2 = over1.groupBy("blk2").agg(F.count("*").alias("c"))
    kept2 = (
        over1.join(b2.filter(F.col("c") <= META_SUBBLOCK_CAP), "blk2")
        .select("doc_id", F.concat(F.lit("2|"), F.col("blk2")).alias("blk"), "sgs")
    )
    dropped = b2.filter(F.col("c") > META_SUBBLOCK_CAP)
    # bounded accounting aggregates (block-count sized, not corpus
    # sized); surfaced as literals on every row so the cap is in the
    # driver-hashed result
    n_reblocked = b1.filter(F.col("c") > META_BLOCK_CAP).count()
    drop_row = dropped.agg(
        F.count("*").alias("nb"), F.coalesce(F.sum("c"), F.lit(0)).alias("nd")
    ).first()
    units = kept1.unionByName(kept2)
    a = units.alias("a")
    b = units.alias("b")
    jac = jaccard(F.col("a.sgs"), F.col("b.sgs"))
    acct_cols = (
        F.lit(n_reblocked).cast("long").alias("n_blocks_reblocked"),
        F.lit(drop_row["nb"]).cast("long").alias("n_subblocks_dropped"),
        F.lit(drop_row["nd"]).cast("long").alias("n_docs_dropped"),
    )
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(jac >= 0.9)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
            *acct_cols,
        )
    )
    # sentinel accounting row (mirrored in the oracle): the drop
    # counters must reach the hashed result even when no pair clears
    # the threshold — riding only on emitted pairs would make an
    # empty result silently eat the dropped mass (r12 ADVICE)
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("doc_a"),
        F.lit(-1).cast("long").alias("doc_b"),
        F.lit(None).cast("double").alias("jaccard"),
        *acct_cols,
    )
    return pairs.unionByName(sentinel)


# Exact all-pairs Jaccard >= 0.8 over 3-gram shingle sets, stated
# with PREFIX FILTERING (Chaudhuri et al. ICDE'06; Xiao et al.
# PPJoin, WWW'08) instead of the exhaustive O(n^2) pair scan: under
# any global total order on shingles (here: ascending document
# frequency, shingle text as tie-break — rare first), two sets with
# |x ∩ y| >= ceil(t*max(|x|,|y|)) MUST share a shingle within their
# (|x| - ceil(t*|x|) + 1)-prefixes, and J(x,y) >= t implies exactly
# that overlap (J <= |∩|/|x| for either side). So joining on prefix
# shingles only — then verifying candidates with the same exact
# Jaccard formula — returns the IDENTICAL result set while the
# candidate join touches only each doc's ~0.2*|sgs| rarest shingles
# (equivalence pinned against the exhaustive form at sf0.001 and
# sf0.01 in tests/test_dedup_property.py; this is what retired the
# sf0.1 sweep skip for every carrier of this oracle, r11 verdict
# item 2). ceil(0.8*sz) is the exact integer (4*sz + 4) // 5.
# The reusable CTE chain (pp-prefixed names so it composes into
# oracles that already use w/sh/ex): requires a prior CTE
# ``w``(doc_id, ws). ``pppref`` holds each doc's prefix shingles;
# consumers build their own candidate CTE (optionally restricted,
# e.g. to arriving-endpoint pairs) and verify against ``ppsh``.
JACCARD_PREFIX_CTES = f"""
ppsh AS (SELECT doc_id, {_SHINGLES_SQL} AS sgs FROM w),
ppex AS (SELECT doc_id, unnest(sgs) AS s FROM ppsh),
ppfreq AS (SELECT s, count(*) AS cnt FROM ppex GROUP BY s),
ppranked AS (
  SELECT e.doc_id, e.s,
         row_number() OVER (PARTITION BY e.doc_id ORDER BY f.cnt, e.s) AS rn,
         count(*) OVER (PARTITION BY e.doc_id) AS sz
  FROM ppex e JOIN ppfreq f USING (s)
),
pppref AS (
  SELECT doc_id, s FROM ppranked
  WHERE rn <= sz - ((4 * sz + 4) // 5) + 1
)"""

# Verified-pair SELECT body shared by the consumers: exact Jaccard
# over shingle sets fetched by id for the candidate pairs only.
JACCARD_VERIFY_SQL = """
SELECT c.doc_a, c.doc_b,
       round(len(list_intersect(x.sgs, y.sgs)) * 1.0
             / len(list_distinct(list_concat(x.sgs, y.sgs))), 4) AS jaccard
FROM ppcand c
JOIN ppsh x ON x.doc_id = c.doc_a
JOIN ppsh y ON y.doc_id = c.doc_b
WHERE len(list_intersect(x.sgs, y.sgs)) * 1.0
      / len(list_distinct(list_concat(x.sgs, y.sgs))) >= 0.8"""

_JACCARD_ALLPAIRS_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
{JACCARD_PREFIX_CTES},
ppcand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pppref a JOIN pppref b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
{JACCARD_VERIFY_SQL}
"""


@register(
    "dedup_minhash_lsh",
    survey_ids=(),
    oracle=_JACCARD_ALLPAIRS_ORACLE,
    doc="MinHash(64) + LSH(16x4) banded bucket join, then exact-"
    "Jaccard verify >= 0.8. The oracle is the exact all-pairs result "
    "stated via prefix filtering (see _JACCARD_ALLPAIRS_ORACLE — "
    "identical rows to the exhaustive pair scan, polynomially "
    "cheaper, so it sweeps at sf0.1 too); comparing LSH output to an "
    "exact oracle is valid because miss probability at s>=0.8 is "
    "(1-s^4)^16 <= 3e-4 and the planted pairs sit at s~0.97 (miss "
    "< 1e-17); the Spark plan itself NEVER does the O(n^2) scan.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL text matches nothing (same policy + reason as the blocked
    # Jaccard tier; pinned by the NULL-text edge-corpus row)
    # fan_out: the sign aggregate below is the CPU-heavy stage and the
    # single-file scan would run it as one task (plans/util.fan_out —
    # no-op at production partition counts)
    docs = fan_out(
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", words_col().alias("ws"))
    )
    sh = docs.select("doc_id", shingles_col(F.col("ws")).alias("sgs"))

    # (doc, shingle) rows -> 64 permutation-mins in ONE codegen'd hash
    # aggregate (map-side partial min), then 16 band keys. Both
    # explodes take their array expression INLINE: exploding a NAMED
    # array column lets InferFiltersFromGenerate plant a size(col) > 0
    # predicate that project-collapse expands back into the full
    # interpreted shingle transform inside the Filter — the shingle
    # build then runs twice per row in BOTH self-join branches
    # (the text_contamination_overlap lesson, r4c; lint-pinned).
    exploded_sh = docs.select(
        "doc_id", F.explode(shingles_col(F.col("ws"))).alias("shingle")
    )
    sig = exploded_sh.groupBy("doc_id").agg(*minhash_agg_exprs())

    # (band_key, doc) — 16 rows per doc, shuffled once on band_key.
    exploded = sig.select(
        "doc_id", F.explode(F.array(*band_key_cols())).alias("band_key")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        # same pair can collide in several bands — dedupe before verify
        .distinct()
    )
    # Verify bucket candidates with exact Jaccard: join the candidate
    # pairs back to the shingle arrays with two PLAIN shuffled equi-joins
    # (cand ⋈ sh on doc_a, then ⋈ sh on doc_b). No broadcast hint: the
    # intermediate cand⋈shingles relation grows O(n·dup_rate) WITH full
    # shingle payloads — at 100 TB a forced broadcast of it blows the
    # driver/executor broadcast limit and kills the job, while these two
    # shuffles are linear in |cand| + |sh| and AQE may still pick a
    # broadcast at runtime when the actual size is genuinely small.
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sgs").alias("sgs_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sgs").alias("sgs_b"))
    verified = cand.join(sh_a, "doc_a").join(sh_b, "doc_b")
    jac = jaccard(F.col("sgs_a"), F.col("sgs_b"))
    return verified.filter(jac >= 0.8).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


# SimHash bit family: bit k of a token's 64-bit signature is
# (base * a_k + b_k) mod P mod 2 — a universal-hash-derived bit from an
# ENGINE-NEUTRAL token base hash (plain ascii/length arithmetic, no
# Spark-internal xxhash), so DuckDB can reproduce the fingerprints
# exactly and the whole operator is differential-testable.
def _simhash_bit_constants() -> list[tuple[int, int]]:
    import random  # noqa: PLC0415

    rng = random.Random(1337)
    return [(rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(64)]


_SIM_BITS = _simhash_bit_constants()

# base(token): positional-codepoint polynomial over the first 10
# characters, the last character, and the length — weights are powers
# of 131 mod P, every product is (BIGINT) * codepoint < 2^62. Two
# tokens collide only if they agree on all sampled positions AND
# length, so the effective vocabulary stays intact (a 4-sample variant
# collapsed it: 3,144 hamming<=3 pairs at sf0.01 vs ~25 real ones).
# Identical arithmetic on both engines (ascii('') = 0 in both; code
# points match for non-ASCII too — tested).
_TOKEN_BASE = (
    "("
    + " + ".join(
        f"{pow(131, i, _P)} * CAST(ascii(substr(token, {i + 1}, 1)) AS BIGINT)"
        for i in range(10)
    )
    + f" + {pow(131, 10, _P)} * CAST(ascii(substr(token, length(token), 1)) AS BIGINT)"
    + f" + {pow(131, 11, _P)} * CAST(length(token) AS BIGINT)"
    + ") % 2147483647"
)

_SIMHASH_FP_SQL = f"""
tok AS (
  SELECT doc_id,
         unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
),
hashed AS (SELECT doc_id, {_TOKEN_BASE} AS h FROM tok),
votes AS (
  SELECT doc_id,
         {", ".join(
             f"sum(CASE WHEN (h * {a} + {b}) % {_P} % 2 = 1 "
             f"THEN 1 ELSE -1 END) AS v{k}"
             for k, (a, b) in enumerate(_SIM_BITS)
         )}
  FROM hashed GROUP BY doc_id
),
fp AS (
  SELECT doc_id,
         CAST({" + ".join(
             f"CASE WHEN v{k} > 0 THEN "
             + (str(1 << k) if k < 63 else "(-9223372036854775807 - 1)")
             + " ELSE 0 END"
             for k in range(64)
         )} AS BIGINT) AS fp
  FROM votes
)"""


@register(
    "dedup_simhash",
    survey_ids=(),
    oracle=f"""
WITH {_SIMHASH_FP_SQL.lstrip()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= 3
""",
    doc="SimHash(64) near-dup: engine-neutral per-token hash bit-votes "
    "folded to a 64-bit fingerprint; candidate pairs share one of 4 "
    "16-bit segments (pigeonhole: hamming<=3 pairs ALWAYS share a "
    "segment, so the banded plan is exactly equivalent to the "
    "exhaustive oracle scan — no approximation); verified by exact "
    "hamming via bit_count(xor). The Spark plan never does the O(n^2) "
    "pair scan the oracle does. Two pair-volume defenses (r4): the "
    "fingerprint table (16 B/doc — what you'd persist at 100 TB) is "
    "localCheckpoint'd so the self-join reads it twice instead of "
    "recomputing the vote aggregation per side, and each pair is "
    "emitted ONLY from its first matching segment (both fps ride the "
    "join, so 'no earlier segment matched' is a join-side bitwise "
    "predicate) — a duplicate cluster of size c yields exactly "
    "C(c,2) join outputs instead of 4x that plus a dropDuplicates "
    "shuffle of the inflated pair set. Measured 2x at sf0.1 (209k "
    "pairs); at 100 TB it deletes the shuffle whose size scales with "
    "segment-count x pairs.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the vote aggregate is the CPU-heavy stage over a
    # single-file scan (plans/util.fan_out — no-op at scale)
    docs = fan_out(
        t(spark, sf_dir, "documents").select("doc_id", words_col().alias("ws"))
    )
    # (doc, token) rows; bit k of the fingerprint = majority vote of
    # the universal-hash bit over the doc's distinct tokens. 64 flat
    # vote aggregates in one codegen'd groupBy (same flat-over-nested-
    # lambda rationale as minhash_agg_exprs), folded into one long.
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct("ws")).alias("token")
    ).withColumn("h", F.expr(_TOKEN_BASE))
    # one F.expr parse per vote/term instead of nested Column
    # operators: the operator form cost ~0.6 s of Python->JVM
    # round-trip latency per invocation (same rationale — and
    # measured equivalence check — as minhash_agg_exprs, r15)
    votes = tok.groupBy("doc_id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN pmod(h * {a}L + {b}L, {_P}) % 2 = 1 "
                f"THEN 1 ELSE -1 END) as v{bit}"
            )
            for bit, (a, b) in enumerate(_SIM_BITS)
        ]
    )
    fp_expr = F.expr(
        " + ".join(
            f"CASE WHEN v{bit} > 0 THEN "
            + (
                f"{1 << bit}L"
                if bit < 63
                else "(-9223372036854775807L - 1L)"
            )
            + " ELSE 0L END"
            for bit in range(64)
        )
    )
    # Materialize the fingerprint table (16 B/doc): the self-join below
    # would otherwise execute the vote aggregation once PER SIDE (no
    # common-subexpression elimination across join inputs).
    fp = votes.select("doc_id", fp_expr.alias("fp")).localCheckpoint()

    def seg16(col: Column, s: int) -> Column:
        return F.shiftright(col, s * 16).bitwiseAND(F.lit(0xFFFF))

    # 4 segments of 16 bits: hamming<=3 => at least one segment equal
    # (pigeonhole). Literal shifts keep everything in codegen.
    seg = fp.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.concat(
                            F.lit(f"{s}:"), seg16(F.col("fp"), s).cast("string")
                        ).alias("k"),
                    )
                    for s in range(4)
                ]
            )
        ).alias("sk"),
    ).select(
        "doc_id",
        "fp",
        F.col("sk.s").alias("seg_idx"),
        F.col("sk.k").alias("seg_key"),
    )
    a = seg.alias("a")
    b = seg.alias("b")
    # First-match emission: a pair sharing m segments would surface m
    # times from the bucket join; requiring "no EARLIER segment also
    # matches" (pure bitwise, both fps are join columns) emits it from
    # exactly one bucket — no pair-dedup shuffle needed.
    earlier_match = None
    for prev in range(3):
        e = (F.col("a.seg_idx") > prev) & (
            seg16(F.col("a.fp"), prev) == seg16(F.col("b.fp"), prev)
        )
        earlier_match = e if earlier_match is None else earlier_match | e
    cand = a.join(
        b,
        (F.col("a.seg_key") == F.col("b.seg_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & ~earlier_match,
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.fp").alias("fp_a"),
        F.col("b.fp").alias("fp_b"),
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.filter(hamming <= 3).select(
        "doc_a", "doc_b", hamming.cast("long").alias("hamming")
    )


# -- duplicate clustering: connected components over near-dup pairs --

MAX_CC_ITERS = 25


def connected_components(
    edges: DataFrame, max_iters: int = MAX_CC_ITERS
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star connected components
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond", Algorithm 3 "two-phase") over an undirected edge list
    ``(u, v)`` of longs. Returns ``(labels, rounds)`` where labels is
    ``(id, label)`` — every node mapped to its component's MINIMUM id
    — and rounds is the number of large+small iterations taken.

    Why not min-label propagation: propagation needs DIAMETER rounds
    (a 1e6-long near-dup chain = 1e6 driver-synchronized jobs — the
    one scale-killer loop left in r4). Star contraction halves
    component height per alternation instead: O(log^2 n) rounds
    proven, O(log n) observed — DIAMETER-INDEPENDENT, pinned by the
    long-path property test (tests/test_cc_stars.py).

    Per round (each one shuffle-bounded, no driver data):
    - large-star: symmetrize edges, per node attach every LARGER
      neighbor to min(N(u) + {u});
    - small-star: orient edges (big, small), per node attach all
      smaller neighbors + self to the minimum.
    Fixpoint = edge set unchanged (count + exceptAll certificate —
    exact, not a checksum that could terminate early on collision).
    localCheckpoint pins each round's frontier so lineage stays flat;
    the 100 TB deployment swaps in checkpoint() to durable storage
    (same two lines) for lineage-free failure recovery.
    """
    # eager checkpoints throughout: a LAZY localCheckpoint recomputes
    # the plan a second time when the checkpoint materializes after the
    # first action (measured: +1 s per round at sf0.1) — the classic
    # persist-before-checkpoint gotcha. Counts ride the checkpoint
    # jobs as observations (r16): the fixpoint loop previously paid
    # one count ACTION per round on top of each round's checkpoint
    # job — on the lifecycle tier those driver round-trips, not stage
    # wall, were the bound (r15 verdict items 3/5).
    obs0 = Observation()
    edges = (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_edges = int(obs0.get["n"] or 0)
    # nodes derive lazily from the checkpointed initial edge set; only
    # the final labels join computes them
    nodes = (
        edges.select(F.col("u").alias("id"))
        .unionByName(edges.select(F.col("v").alias("id")))
        .distinct()
    )
    rounds = 0
    for _ in range(max_iters):
        if n_edges == 0:
            break
        rounds += 1
        # large-star: group the symmetrized neighborhood of u, attach
        # each neighbor v > u to m = min(N(u) + {u})
        nbrs = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmin = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            nbrs.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: orient (big=u, small=v); attach every smaller
        # neighbor and u itself to the group minimum
        smin = large.groupBy("u").agg(F.min("v").alias("m"))
        joined = large.join(smin, "u")
        obs_i = Observation()
        small = (
            joined.filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(joined.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .observe(obs_i, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        new_n = int(obs_i.get["n"] or 0)
        if new_n == n_edges and small.exceptAll(edges).limit(1).count() == 0:
            edges = small
            break
        edges, n_edges = small, new_n
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} "
            "large/small-star rounds — O(log^2 n) bound exceeded; "
            "raise max_iters"
        )
    # at fixpoint every edge is (child, component-min); groupBy-min is
    # belt-and-braces for the final (already-star) state
    labels = nodes.join(
        edges.groupBy("u").agg(F.min("v").alias("lbl")),
        nodes.id == F.col("u"),
        "left",
    ).select("id", F.coalesce("lbl", F.col("id")).alias("label"))
    return labels, rounds


@register(
    "dedup_cluster_components",
    survey_ids=(),
    oracle=f"""
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
SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN labels l ON d.doc_id = l.id
""",
    doc="Duplicate CLUSTERING: connected components over the blocked-"
    "Jaccard near-dup pairs, so every document gets a canonical "
    "cluster id (the component's min doc_id — what a corpus dedup "
    "keeps) and transitively-linked near-dups land in ONE cluster "
    "even when the endpoints were never compared directly. Spark "
    "side (r5): alternating large-star/small-star contraction "
    "(Kiveris et al. 2014) — O(log^2 n) rounds proven, DIAMETER-"
    "INDEPENDENT, replacing r4's min-label propagation whose round "
    "count scaled with component diameter (the last scale-killer "
    "loop; see connected_components). This is the iterative-"
    "algorithm tier of the brief; the DuckDB twin is a recursive-CTE "
    "reachability closure, so the driver hash-checks an algorithm "
    "SQL alone cannot express non-recursively.",
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_ngram_jaccard_blocked(spark, sf_dir).select("doc_a", "doc_b")
    labels, _ = connected_components(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    docs = t(spark, sf_dir, "documents").select("doc_id")
    return docs.join(labels, docs.doc_id == labels.id, "left").select(
        "doc_id", F.coalesce("label", "doc_id").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# Exact-substring span dedup (Lee et al. 2021, "Deduplicating Training
# Data Makes Language Models Better" — the ExactSubstr pass): any
# K-token span occurring more than once in the corpus is a duplicated
# span; per document we report how many of its tokens are covered by
# at least one duplicated span. The published implementation builds a
# corpus-wide suffix array on one machine; the distributed
# re-expression here is the K-gram inverted-index formulation: one
# shuffle keyed by gram hash (3 longs per token of the corpus — the
# inherent cost), then a per-document in-row interval-union fold.
# ---------------------------------------------------------------------------

K_SPAN = 8  # tokens per span seed (Lee et al. use 50 BPE tokens at web scale)


def _gram_hashes(k: int):
    """Per-position 128-bit gram fingerprints: array<struct<h1,h2>> of
    TWO independently-seeded xxhash64 values over each k-token gram
    (h2 prepends a salt literal, giving an independent keyspace).

    One 64-bit hash collides at corpus scale: ~1e13 grams in 100 TB
    puts the 64-bit birthday bound at p ~ 1 — a silent false
    "duplicated" mark (and in the cut variant, silently removed text).
    Grouping on the (h1, h2) PAIR is a 128-bit key: p ~ G^2 / 2^129
    ~ 1e-13 at 1e13 grams (ADVICE r4). Cost: one extra long per gram
    row in the inverted-index shuffle (3 -> 4 longs). The gram string
    materializes once in the inner transform; both hashes map over it.
    """
    grams = F.transform(
        F.sequence(F.lit(0), (F.col("n_tok") - k).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i + 1, k)),
    )
    pair = F.transform(
        grams,
        lambda g: F.struct(
            F.xxhash64(g).alias("h1"), F.xxhash64(F.lit("xs2"), g).alias("h2")
        ),
    )
    return F.when(F.col("n_tok") >= k, pair).otherwise(
        F.array().cast("array<struct<h1:bigint,h2:bigint>>")
    )


# tokenizer pairs (Spark expr, DuckDB SQL) — proven hash-identical in
# the token-stats queries: whitespace words, and the BPE-ish regex
# (runs of letters, runs of digits, single other chars; no token can
# contain a space, so the ' '-joined gram string stays injective)
_WS_TOKENS_SQL = "list_filter(string_split(text, ' '), w -> w <> '')"
_BPE_TOKENS_SQL = "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')"


def _ws_tokens():
    return F.filter(F.split(F.col("text"), " "), lambda w: w != "")


def _bpe_tokens():
    return F.regexp_extract_all(
        F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
    )


def _spans_oracle(k: int, tokens_sql: str) -> str:
    return (
        f"WITH toks AS (SELECT doc_id, {tokens_sql} AS tk FROM documents),"
        + _spans_oracle_body(k)
    )


def _spans_oracle_body(k: int) -> str:
    """Everything after the ``toks`` CTE — reused by the trained-BPE
    variant, whose toks come from the BPE rewrite chain instead of a
    stateless tokenizer expression."""
    return f"""
sized AS (SELECT doc_id, tk, len(tk) AS n_tok FROM toks),
grams AS (
  SELECT doc_id,
         unnest(range(1, n_tok - {k} + 2)) - 1 AS pos,
         unnest(list_transform(range(1, n_tok - {k} + 2),
                i -> array_to_string(list_slice(tk, i, i + {k} - 1), ' ')))
           AS g
  FROM sized WHERE n_tok >= {k}
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
dpos AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
merged AS (
  SELECT doc_id, pos,
         max(pos + {k} - 1) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM dpos
),
agg AS (
  SELECT doc_id,
         count(*) AS n_dup_grams,
         sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                  THEN 1 ELSE 0 END) AS n_spans,
         sum(greatest(0, pos + {k}
                         - greatest(coalesce(prev_end, -1) + 1, pos)))
           AS dup_tokens
  FROM merged GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(s.n_tok AS BIGINT) AS n_tok,
       CAST(coalesce(a.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       round(coalesce(a.dup_tokens, 0)
             / CAST(nullif(s.n_tok, 0) AS DOUBLE), 6) AS dup_frac
FROM sized s LEFT JOIN agg a USING (doc_id)
"""


def _exact_substring_spans(
    spark: SparkSession, sf_dir: str, k: int, tokens
) -> DataFrame:
    """Shared ExactSubstr span reporter, parameterized by span length
    ``k`` and tokenizer expression (r5, VERDICT #5)."""
    docs = t(spark, sf_dir, "documents")
    return _exact_substring_over(docs.select("doc_id", tokens.alias("tk")), k)


def _exact_substring_over(toks: DataFrame, k: int) -> DataFrame:
    """The span core over an already tokenized (doc_id, tk) frame —
    shared by the stateless-tokenizer variants and the trained-BPE
    variant (r6), whose tokens come from the BPE rewrite chain."""
    base = toks.select(
        "doc_id", "tk", F.size("tk").cast("long").alias("n_tok")
    )
    # per-position 128-bit gram fingerprints; empty when too short.
    # fan_out: gram building (k-token slice + concat + double hash per
    # position) is the CPU of this family and the single-row-group
    # test scan runs it as ONE task otherwise. eager_checkpoint: the
    # gram stream feeds BOTH the dup-hash aggregate and the semi-join
    # probe leg — without it the whole tokenize+hash pipeline is
    # inlined and paid twice (profiled as two ~equal Generate stages).
    grams = eager_checkpoint(
        fan_out(base)
        .select("doc_id", F.posexplode(_gram_hashes(k)).alias("pos", "gh"))
        .select("doc_id", "pos", "gh.h1", "gh.h2")
    )
    dup_hashes = (
        grams.groupBy("h1", "h2")
        .count()
        .filter(F.col("count") >= 2)
        .select("h1", "h2")
    )
    dpos = grams.join(dup_hashes, ["h1", "h2"], "leftsemi")
    fold = F.expr(
        f"""
aggregate(ps,
  -- sentinel end = -2: position 0 must register as a NEW span
  -- (p > end + 1 must hold), and covered's greatest(end + 1, p)
  -- still clamps to p for the first interval.
  named_struct('end', CAST(-2 AS BIGINT), 'spans', 0L, 'covered', 0L),
  (acc, p) -> named_struct(
    'end', greatest(acc.end, CAST(p AS BIGINT) + {k - 1}),
    'spans', acc.spans + IF(CAST(p AS BIGINT) > acc.end + 1, 1L, 0L),
    'covered', acc.covered + greatest(0L,
      CAST(p AS BIGINT) + {k}
        - greatest(acc.end + 1, CAST(p AS BIGINT)))),
  acc -> named_struct('spans', acc.spans, 'covered', acc.covered))
"""
    )
    per_doc = (
        dpos.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_grams"),
            F.sort_array(F.collect_list("pos")).alias("ps"),
        )
        .select(
            "doc_id",
            "n_dup_grams",
            fold.getField("spans").alias("n_spans"),
            fold.getField("covered").alias("dup_tokens"),
        )
    )
    return base.select("doc_id", "n_tok").join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tok",
        F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        # nullif: an empty document (n_tok = 0) must yield a NULL
        # fraction, not an ANSI divide-by-zero (edge-corpus test)
        F.round(
            F.coalesce("dup_tokens", F.lit(0))
            / F.nullif(F.col("n_tok"), F.lit(0)).cast("double"),
            6,
        ).alias("dup_frac"),
    )


@register(
    "dedup_exact_substring_spans",
    survey_ids=(),
    oracle=_spans_oracle(K_SPAN, _WS_TOKENS_SQL),
    doc="Exact-substring span dedup (Lee et al. 2021 ExactSubstr pass, "
    "re-expressed distributed): every K_SPAN-token gram is hashed "
    "(xxhash64, JVM-side), grams occurring >= 2 times corpus-wide mark "
    "duplicated positions, and a per-document interval-union fold over "
    "the SORTED position list (aggregate with struct state — zero "
    "window, map-side combinable collect) yields covered-token counts "
    "and maximal-span counts. Shuffle cost: one row of four longs per "
    "corpus token for the gram index (the algorithm's inherent cost; "
    "the published suffix-array variant is single-machine), plus one "
    "doc-keyed shuffle of only the DUPLICATED positions. Grams key on "
    "a 128-bit (h1, h2) double xxhash64 so a corpus-scale collision "
    "cannot silently mark unrelated grams duplicated (see "
    "_gram_hashes). The oracle groups raw gram STRINGS — an "
    "independent formulation that certifies collision-freedom "
    "end-to-end at test scale.",
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _exact_substring_spans(spark, sf_dir, K_SPAN, _ws_tokens())


K_SPAN_BPE = 50  # Lee et al.'s published span length (50 BPE tokens)


@register(
    "dedup_exact_substring_spans_k50",
    survey_ids=(),
    oracle=_spans_oracle(K_SPAN_BPE, _BPE_TOKENS_SQL),
    doc="ExactSubstr at the PUBLISHED span length: K=50 over BPE-ish "
    "regex tokens (Lee et al. 2021 use 50 BPE tokens at web scale; "
    "the K=8 whitespace variant above exists because short synthetic "
    "docs need a shorter seed to exercise the span-merge logic). "
    "Same parameterized core — 128-bit gram keys, one 4-long row per "
    "token shuffle, in-row interval-union fold. Shuffle-cost delta "
    "vs K=8 is documented in SCALE.md: gram ROW COUNT is identical "
    "(one per token position), so K only changes the hashed-string "
    "length CPU, not shuffle bytes — the index carries hashes, never "
    "gram text.",
)
def dedup_exact_substring_spans_k50(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _exact_substring_spans(spark, sf_dir, K_SPAN_BPE, _bpe_tokens())


def _bpe_trained_spans_oracle() -> str:
    from .textops import BPE_ROUNDS, _bpe_cte_parts  # noqa: PLC0415

    return (
        "WITH "
        + ",".join(_bpe_cte_parts())
        + f",\ntoks AS (SELECT doc_id, tk FROM t{BPE_ROUNDS} "
        "WHERE tk IS NOT NULL),"
        + _spans_oracle_body(K_SPAN_BPE)
    )


@register(
    "dedup_exact_substring_bpe_trained",
    survey_ids=(),
    oracle=_bpe_trained_spans_oracle(),
    doc="ExactSubstr K=50 over TRAINED BPE tokens (r6 — closes the "
    "'BPE-ish regex' gap flagged in the r5 verdict): the corpus is "
    "re-tokenized with the 3 learned merge rules (the "
    "text_bpe_apply_merges chain), and the published Lee et al. "
    "K=50-token span pass runs over those merged tokens — tokenizer "
    "training and dedup now share one vocabulary, exactly like a "
    "production pipeline. Merged tokens are space-free "
    "concatenations of whitespace tokens, so the ' '-joined gram "
    "string stays injective and the 128-bit gram keys carry over "
    "unchanged. The oracle replays the full composition: the BPE "
    "CTE chain INTO the span-merge SQL (NULL-text docs excluded on "
    "both engines). Plan: the trainer's per-round pair-count "
    "shuffles + the span pass's one 4-long row per token gram-index "
    "shuffle — the merges themselves are narrow in-row folds.",
)
def dedup_exact_substring_bpe_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .textops import _bpe_train_chain  # noqa: PLC0415

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", _ws_tokens().alias("tk"))
    )
    _, rewritten = _bpe_train_chain(docs)
    return _exact_substring_over(rewritten, K_SPAN_BPE)


@register(
    "dedup_exact_substring_cut",
    survey_ids=(),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS tk
  FROM documents
),
sized AS (SELECT doc_id, tk, len(tk) AS n_tok FROM toks),
grams AS (
  SELECT doc_id,
         unnest(range(1, n_tok - {K_SPAN} + 2)) - 1 AS pos,
         unnest(list_transform(range(1, n_tok - {K_SPAN} + 2),
                i -> array_to_string(list_slice(tk, i, i + {K_SPAN} - 1), ' ')))
           AS g
  FROM sized WHERE n_tok >= {K_SPAN}
),
ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM grams
),
losers AS (SELECT doc_id, pos FROM ranked WHERE n >= 2 AND rn > 1),
per_doc AS (
  SELECT doc_id, list_sort(list(pos)) AS ps FROM losers GROUP BY doc_id
),
cleaned AS (
  SELECT s.doc_id, s.n_tok,
         CASE WHEN p.ps IS NULL THEN s.tk
              ELSE list_filter(s.tk, (w, i) ->
                     len(list_filter(p.ps,
                         q -> q <= i - 1 AND i - 1 < q + {K_SPAN})) = 0)
         END AS kept
  FROM sized s LEFT JOIN per_doc p USING (doc_id)
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(len(kept) AS BIGINT) AS kept_tok,
       CAST(n_tok - len(kept) AS BIGINT) AS cut_tok,
       md5(coalesce(array_to_string(kept, ' '), '')) AS kept_digest
FROM cleaned
""",
    doc="Exact-substring REMOVAL (the output side of Lee et al. "
    "ExactSubstr): every duplicated K_SPAN-gram occurrence except the "
    "canonical one (globally minimal (doc_id, pos)) is cut; a "
    "document's surviving text is its tokens outside the union of its "
    "loser spans. Same gram-index shuffle as the span reporter plus "
    "one min_by per gram (map-side combinable) for the winner; the "
    "cleaned text is rebuilt IN-ROW (filter-by-index against the "
    "sorted loser positions) and certified by an md5 digest, so the "
    "oracle checks the actual rewritten corpus, not just counts. "
    "Within-doc repeats keep only their first occurrence too. Note "
    "the same caveat as the published byte-range cutter: a canonical "
    "occurrence can still be clipped when a DIFFERENT gram's loser "
    "span overlaps it — span union, not per-gram surgery, is what "
    "gets removed.",
)
def dedup_exact_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    base = docs.select("doc_id", toks.alias("tk")).select(
        "doc_id", "tk", F.size("tk").cast("long").alias("n_tok")
    )
    # 128-bit (h1, h2) gram keys — a collision here would CUT unrelated
    # text, the worst silent-failure mode (see _gram_hashes).
    # fan_out + eager_checkpoint for the same reasons as
    # _exact_substring_over: parallelize the gram CPU and stop the
    # winners/losers legs from re-running the tokenize+hash pipeline.
    grams = eager_checkpoint(
        fan_out(base)
        .select("doc_id", F.posexplode(_gram_hashes(K_SPAN)).alias("pos", "gh"))
        .select("doc_id", "pos", "gh.h1", "gh.h2")
    )
    winners = (
        grams.groupBy("h1", "h2")
        .agg(
            F.count("*").alias("n"),
            F.min_by(
                F.struct(F.col("doc_id").alias("w_doc"), F.col("pos").alias("w_pos")),
                F.struct("doc_id", "pos"),
            ).alias("w"),
        )
        .filter(F.col("n") >= 2)
        .select("h1", "h2", "w.w_doc", "w.w_pos")
    )
    losers = grams.join(winners, ["h1", "h2"]).filter(
        ~((F.col("doc_id") == F.col("w_doc")) & (F.col("pos") == F.col("w_pos")))
    )
    per_doc = losers.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("ps")
    )
    joined = base.join(per_doc, "doc_id", "left")
    kept = F.when(F.col("ps").isNull(), F.col("tk")).otherwise(
        F.expr(
            f"filter(tk, (w, i) -> "
            f"size(filter(ps, q -> q <= i AND i < q + {K_SPAN})) = 0)"
        )
    )
    return joined.select(
        "doc_id",
        "n_tok",
        F.size(kept).cast("long").alias("kept_tok"),
        (F.col("n_tok") - F.size(kept)).cast("long").alias("cut_tok"),
        F.md5(F.concat_ws(" ", kept)).alias("kept_digest"),
    )


@register(
    "dedup_cluster_keep_best",
    survey_ids=(),
    oracle=f"""
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
labels AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
clustered AS (
  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
         d.n_chars
  FROM documents d LEFT JOIN labels l ON d.doc_id = l.id
)
SELECT doc_id, cluster_id,
       (row_number() OVER (
          PARTITION BY cluster_id
          ORDER BY n_chars DESC, doc_id) = 1) AS keep
FROM clustered
""",
    doc="Duplicate-cluster resolution with a QUALITY policy: every "
    "near-dup cluster (connected components over the blocked-Jaccard "
    "pairs — the same large-star/small-star core) keeps its LONGEST "
    "member (n_chars, doc_id tie-break) instead of the smallest id — "
    "what a production corpus dedup actually ships (drop the "
    "truncated copies, keep the fullest). Spark side: cluster labels "
    "from connected_components, then one max_by-struct aggregate per "
    "cluster (map-side combinable, no window on the big side) joined "
    "back as the keep flag. Singleton documents are their own cluster "
    "and always keep.",
)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_ngram_jaccard_blocked(spark, sf_dir).select("doc_a", "doc_b")
    labels, _ = connected_components(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    clustered = docs.join(labels, docs.doc_id == labels.id, "left").select(
        "doc_id",
        F.coalesce("label", "doc_id").alias("cluster_id"),
        "n_chars",
    )
    best = clustered.groupBy("cluster_id").agg(
        F.max_by(
            F.col("doc_id"),
            F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nd")),
        ).alias("best_doc")
    )
    return clustered.join(best, "cluster_id").select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("best_doc")).alias("keep"),
    )


# -- Exact set-similarity join via prefix filtering (AllPairs/PPJoin) --------
#
# Jaccard threshold as an exact rational: t = PPJ_NUM/PPJ_DEN = 3/5.
# Every bound below is integer arithmetic, so both engines agree
# bit-for-bit with no float ceil/round hazards.


def _ratio_env(var: str, num: int, den: int) -> tuple[int, int]:
    """Threshold override for the OUTPUT-BOUND similarity joins, as an
    exact rational ``"N/D"`` (r13 verdict item 5): at sf0.1 the two
    prefix-filter joins' ANSWERS are ~11M pairs on the template-heavy
    corpus, so the verification sweep's cost is Ω(answer) — correct
    but the dominant tax on every round's gate. The remedy the verdict
    prescribes is to cut the ANSWER, not the check: the sweep harness
    (tools/full_sweep.py) raises the thresholds at sf0.1 via these env
    vars BEFORE importing the registry, and because BOTH the Spark
    plan and the DuckDB oracle f-string are built from the same
    constants at import time, any override is engine-symmetric BY
    CONSTRUCTION — there is no code path where the two engines see
    different thresholds. Unset (every other context: the driver's
    sf0.01 correctness gate, bench, curves, tests, default sweeps) the
    canonical defaults apply, and the default-threshold equivalence /
    sensitivity proofs in tests/test_dedup_property.py and
    tests/test_r13_fixes.py pin those."""
    import os  # noqa: PLC0415

    raw = os.environ.get(var)
    if not raw:
        return num, den
    n_s, d_s = raw.split("/", 1)
    n, d = int(n_s), int(d_s)
    if not (0 < n <= d):
        raise ValueError(f"{var}={raw!r}: need a rational in (0, 1]")
    return n, d


def _slice_env(var: str = "SPARK_GRAFT_DEDUP_DOC_MOD") -> int:
    """Corpus-slice override for the OUTPUT-BOUND similarity joins —
    the ``_ratio_env`` pattern generalized (r14 verdict item 2): even
    at the 9/10 containment threshold the sf0.1 sweep pays Ω(answer +
    candidate volume) on the template-heavy corpus, so the harness
    additionally sweeps those two joins on a deterministic corpus
    SLICE (``doc_id % MOD == 0``). The modulus is read ONCE at import
    and baked into BOTH the Spark plan and the DuckDB oracle f-string
    — engine-symmetric by construction, exactly like the thresholds:
    there is no code path where the engines disagree about which
    documents participate (document frequencies, prefixes and answers
    are all computed AFTER the slice in both engines). Unset (driver
    gate, bench, curves, tests) the modulus is 1 — the full corpus."""
    import os  # noqa: PLC0415

    raw = os.environ.get(var)
    if not raw:
        return 1
    mod = int(raw)
    if mod < 1:
        raise ValueError(f"{var}={raw!r}: need a positive modulus")
    return mod


PPJ_NUM, PPJ_DEN = _ratio_env("SPARK_GRAFT_PPJOIN_T", 3, 5)
DEDUP_DOC_MOD = _slice_env()


@register(
    "dedup_jaccard_prefix_filter",
    survey_ids=(),
    oracle=f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t.tk AS tk
  FROM documents,
       unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS t(tk)
  WHERE doc_id % {DEDUP_DOC_MOD} = 0
),
df AS (SELECT tk, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY tk),
ranked AS (
  SELECT t.doc_id, t.tk,
         row_number() OVER (
           PARTITION BY t.doc_id ORDER BY d.df, t.tk) AS pos,
         count(*) OVER (PARTITION BY t.doc_id) AS len
  FROM tok t JOIN df d USING (tk)
),
prefix AS (
  -- prefix length = len - ceil(t*len) + 1, ceil(3*len/5) exactly
  SELECT doc_id, tk, len FROM ranked
  WHERE pos <= len - (({PPJ_NUM} * len + {PPJ_DEN} - 1) // {PPJ_DEN}) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.len AS len_a, b.len AS len_b
  FROM prefix a JOIN prefix b
    ON a.tk = b.tk AND a.doc_id < b.doc_id
  -- length filter: |A|/|B| >= t is necessary for J >= t
  WHERE {PPJ_DEN} * least(a.len, b.len)
        >= {PPJ_NUM} * greatest(a.len, b.len)
),
-- verify by intersecting per-doc sorted integer token-id lists
-- instead of a 3-way (doc, token) join (r12 — the same exact
-- acceleration as the containment oracle; identical n_common since
-- tok is per-doc DISTINCT)
tokid AS (SELECT tk, row_number() OVER (ORDER BY df, tk) AS tid FROM df),
lists AS (
  SELECT t.doc_id, list_sort(list(ti.tid)) AS tl
  FROM tok t JOIN tokid ti USING (tk) GROUP BY t.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b, c.len_a, c.len_b,
         len(list_intersect(x.tl, y.tl)) AS n_common
  FROM cand c
  JOIN lists x ON x.doc_id = c.doc_a
  JOIN lists y ON y.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE)
             / (len_a + len_b - n_common), 6) AS jaccard
FROM verified
WHERE {PPJ_DEN} * n_common >= {PPJ_NUM} * (len_a + len_b - n_common)
""",
    doc="EXACT set-similarity self-join (word-set Jaccard >= 3/5) via "
    "PREFIX FILTERING — the AllPairs/PPJoin family (Bayardo et al., "
    "WWW'07; Xiao et al., WWW'08): order each document's token set "
    "by ascending global document frequency, keep only the first "
    "len - ceil(t*len) + 1 tokens as the PREFIX, and generate "
    "candidates by equi-joining prefixes — two sets with "
    "J >= t MUST share a prefix token (pigeonhole on the rarest "
    "tokens), so recall is exactly 1 with a candidate volume driven "
    "by RARE-token collisions instead of all n^2 pairs; a length "
    "filter (t*|B| <= |A|) prunes further before exact-intersection "
    "verification. This is the EXACT counterpart of the MinHash tier "
    "(approximate) and the first-5-words blocker (heuristic): same "
    "answer as the brute-force join, provably, at equi-join cost. "
    "Everything is integer arithmetic (threshold as the rational "
    "3/5, ceil via (3*len+4)//5), so both engines agree exactly; "
    "the only float is the final reported jaccard — one IEEE "
    "division of agreed integers. At 100 TB the df table is the "
    "broadcast side, prefixes shuffle ~(1-t)·tokens rows, and the "
    "verification join ships id pairs before fetching token sets.",
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    # sweep-time corpus slice, engine-symmetric with the oracle's
    # identical predicate (DEDUP_DOC_MOD == 1 everywhere but the
    # sf0.1 sweep harness — see _slice_env)
    docs = t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % DEDUP_DOC_MOD == 0
    )
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        ).alias("tk"),
    ).distinct()
    df = tok.groupBy("tk").agg(F.count("*").cast("long").alias("df"))
    wr = Window.partitionBy("doc_id").orderBy("df", "tk")
    wl = Window.partitionBy("doc_id")
    ranked = (
        tok.join(F.broadcast(df), "tk")
        .withColumn("pos", F.row_number().over(wr))
        .withColumn("len", F.count("*").over(wl))
    )
    prefix_len = (
        F.col("len")
        - F.floor((PPJ_NUM * F.col("len") + PPJ_DEN - 1) / PPJ_DEN)
        + 1
    )
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(
        "doc_id", "tk", "len"
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tk") == F.col("b.tk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            PPJ_DEN * F.least(F.col("a.len"), F.col("b.len"))
            >= PPJ_NUM * F.greatest(F.col("a.len"), F.col("b.len"))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.len").alias("len_a"),
            F.col("b.len").alias("len_b"),
        )
        .distinct()
    )
    # intersection size via a COMPOSITE equi-join on (doc_b, token):
    # joining on doc_b alone and filtering token equality afterwards
    # would materialize |A|x|B| rows per candidate pair first
    x = tok.select(F.col("doc_id").alias("doc_a"), F.col("tk").alias("xtk"))
    y = tok.select(F.col("doc_id").alias("doc_b"), F.col("tk").alias("xtk"))
    verified = (
        cand.join(x, "doc_a")
        .join(y, ["doc_b", "xtk"])
        .groupBy("doc_a", "doc_b", "len_a", "len_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return verified.filter(
        PPJ_DEN * F.col("n_common")
        >= PPJ_NUM * (F.col("len_a") + F.col("len_b") - F.col("n_common"))
    ).select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("n_common").cast("double")
            / (F.col("len_a") + F.col("len_b") - F.col("n_common")),
            6,
        ).alias("jaccard"),
    )


# Containment threshold as an exact rational: |A ∩ B| >= 4/5 * |A|.
# Sweep-time override (engine-symmetric by construction): _ratio_env.
CONT_NUM, CONT_DEN = _ratio_env("SPARK_GRAFT_CONTAINMENT_T", 4, 5)


@register(
    "dedup_containment_join",
    survey_ids=(),
    oracle=f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t.tk AS tk
  FROM documents,
       unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS t(tk)
  WHERE doc_id % {DEDUP_DOC_MOD} = 0
),
df AS (SELECT tk, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY tk),
tokid AS (SELECT tk, row_number() OVER (ORDER BY df, tk) AS tid FROM df),
ranked AS (
  SELECT t.doc_id, ti.tid,
         row_number() OVER (PARTITION BY t.doc_id ORDER BY ti.tid) AS pos,
         count(*) OVER (PARTITION BY t.doc_id) AS len
  FROM tok t JOIN tokid ti USING (tk)
),
lists AS (
  SELECT doc_id, list_sort(list(tid)) AS tl, any_value(len) AS len
  FROM ranked GROUP BY doc_id
),
prefix AS (
  SELECT doc_id, tid, pos, len FROM ranked
  WHERE pos <= len - (({CONT_NUM} * len + {CONT_DEN} - 1) // {CONT_DEN}) + 1
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.len AS len_a
  FROM prefix a JOIN ranked b ON a.tid = b.tid
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2, 3
  HAVING max(least(a.len - a.pos, b.len - b.pos) + 1) * {CONT_DEN}
         >= {CONT_NUM} * a.len
),
verified AS (
  SELECT c.doc_a, c.doc_b, c.len_a,
         len(list_intersect(x.tl, y.tl)) AS n_common
  FROM cand c
  JOIN lists x ON x.doc_id = c.doc_a
  JOIN lists y ON y.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / len_a, 6) AS containment
FROM verified
WHERE {CONT_DEN} * n_common >= {CONT_NUM} * len_a
""",
    doc="ASYMMETRIC CONTAINMENT join (|A inter B| >= 4/5 |A|): finds "
    "documents mostly CONTAINED in another — quote inclusion, "
    "boilerplate wrapping, chunk-of-a-document — the direction "
    "symmetric Jaccard cannot see (a tweet quoted inside an article "
    "has Jaccard ~0 but containment ~1). Same pigeonhole prefix as "
    "the AllPairs join, applied one-sided: only the CONTAINED "
    "candidate's rarest len - ceil(t*len) + 1 tokens generate "
    "candidates (if B misses all of them it misses too many of A), "
    "joined against the container side's FULL token index — recall "
    "exactly 1, no length filter (the container may be arbitrarily "
    "large). Candidate volume is governed by the df of A's RAREST "
    "tokens, which is what makes the one-sided prefix viable at "
    "scale; verification is the same composite (doc, token) "
    "equi-join. Exact integer threshold; both directions of a "
    "mutually-containing pair emit as separate rows. The ORACLE "
    "states the same result with two exact accelerations so it "
    "sweeps at sf0.1 (r11 verdict item 2): a PPJoin-style positional "
    "filter (overlap <= 1 + min(tokens-after-match on either side) "
    "at the earliest shared prefix token, since both docs rank "
    "tokens by the same global order) prunes candidates, and the "
    "verify intersects per-doc sorted integer token-id lists instead "
    "of a 3-way (doc, token) join — equivalence to the exhaustive "
    "form pinned in tests/test_dedup_property.py.",
)
def dedup_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    # sweep-time corpus slice, engine-symmetric with the oracle's
    # identical predicate (DEDUP_DOC_MOD == 1 everywhere but the
    # sf0.1 sweep harness — see _slice_env)
    docs = t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % DEDUP_DOC_MOD == 0
    )
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        ).alias("tk"),
    ).distinct()
    df = tok.groupBy("tk").agg(F.count("*").cast("long").alias("df"))
    wr = Window.partitionBy("doc_id").orderBy("df", "tk")
    wl = Window.partitionBy("doc_id")
    ranked = (
        tok.join(F.broadcast(df), "tk")
        .withColumn("pos", F.row_number().over(wr))
        .withColumn("len", F.count("*").over(wl))
    )
    prefix_len = (
        F.col("len")
        - F.floor((CONT_NUM * F.col("len") + CONT_DEN - 1) / CONT_DEN)
        + 1
    )
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(
        "doc_id", "tk", "pos", "len"
    )
    # candidate generation with the PPJoin positional filter (the
    # same exact bound the oracle applies): both docs rank tokens by
    # the identical global (df, tk) order, so every common token sits
    # at-or-after the earliest shared prefix token — the achievable
    # overlap is 1 + min(tokens-remaining on either side) at the best
    # match, and pairs whose bound cannot reach ceil(t*len_a) are cut
    # BEFORE the verification join (~24% of candidates on the sf0.1
    # corpus). The aggregate replaces the former distinct() — same
    # single shuffle on the pair key.
    cand = (
        prefix.alias("a")
        .join(
            ranked.alias("b"),
            (F.col("a.tk") == F.col("b.tk"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.len").alias("len_a"),
        )
        .agg(
            F.max(
                F.least(
                    F.col("a.len") - F.col("a.pos"),
                    F.col("b.len") - F.col("b.pos"),
                )
                + 1
            ).alias("ub")
        )
        .filter(CONT_DEN * F.col("ub") >= CONT_NUM * F.col("len_a"))
        .drop("ub")
    )
    x = tok.select(F.col("doc_id").alias("doc_a"), F.col("tk").alias("xtk"))
    y = tok.select(F.col("doc_id").alias("doc_b"), F.col("tk").alias("xtk"))
    verified = (
        cand.join(x, "doc_a")
        .join(y, ["doc_b", "xtk"])
        .groupBy("doc_a", "doc_b", "len_a")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return verified.filter(
        CONT_DEN * F.col("n_common") >= CONT_NUM * F.col("len_a")
    ).select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("n_common").cast("double") / F.col("len_a"), 6
        ).alias("containment"),
    )


@register(
    "dedup_exact_hash_first_wins",
    survey_ids=("A10", "S8"),
    oracle="""
WITH hashed AS (
  SELECT doc_id, text, md5(coalesce(text, '')) AS h FROM documents
)
SELECT h AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(count(DISTINCT coalesce(text, '')) AS BIGINT) AS n_distinct_texts
FROM hashed
GROUP BY h
""",
    doc="Exact dedup ON THE HASH — the scale path the text-keyed "
    "variant's docstring promises, materialized: group on "
    "md5(text) so the shuffle key is 32 bytes regardless of "
    "document size (the text-keyed variant ships full documents "
    "through the exchange — correct, but the shuffle weighs "
    "corpus-bytes instead of corpus-rows). md5 rather than xxhash64 "
    "keeps the oracle engine-neutral; the plan shape (one hash "
    "aggregate on a fixed-width key) is identical to the xxhash64 "
    "production form. n_distinct_texts is the COLLISION PROBE: it is "
    "1 for every group unless two distinct texts share a hash — the "
    "resolve-rare-collisions step the docstring calls for, here "
    "surfaced as a checked column (a collision would also "
    "hash-mismatch any oracle that grouped by raw text). NULL text "
    "coalesces to the empty string on both engines, merging the "
    "content-free classes deliberately.",
)
def dedup_exact_hash_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    h = F.md5(F.coalesce(F.col("text"), F.lit("")))
    return docs.groupBy(h.alias("text_hash")).agg(
        F.min("doc_id").cast("long").alias("canonical_doc_id"),
        F.count("*").cast("long").alias("n_copies"),
        F.countDistinct(F.coalesce(F.col("text"), F.lit("")))
        .cast("long")
        .alias("n_distinct_texts"),
    )
