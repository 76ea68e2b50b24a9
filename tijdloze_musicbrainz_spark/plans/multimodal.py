"""Multimodal-column plumbing — the brief's image/audio/video tier.

The pattern at 100 TB: media lives as an opaque ``binary`` column
with typed metadata beside it; decode / feature-extract runs as an
Arrow-batched Pandas iterator (``mapInPandas``) so bytes cross the
JVM<->Python boundary once per batch, not once per row, and the
pipeline repartitions BEFORE the expensive stage so decode
parallelism is independent of upstream file layout.

The container has no image/audio libs, so the real decoders are
STUBS behind ``NotImplementedError`` (``decode_image_real``); the
Spark-side plumbing — binary schema, batch iterator signature,
explicit output schema, pre-stage repartition — is real and tested
via a deterministic fake "decoder" (byte-level features) that a
DuckDB oracle can reproduce (``multimodal_fake_decode``).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .util import t

DECODE_OUT_SCHEMA = (
    "event_id bigint, n_bytes bigint, first_byte bigint, byte_sum_mod bigint"
)


def decode_image_real(blob: bytes) -> dict:
    """Real decoder stub: would PIL-open the blob and emit
    (width, height, channels). The imaging libraries are not in this
    container — the plumbing around this function is what's tested."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; use the fake byte-feature decoder for plumbing tests"
    )


def fake_byte_features(spark: SparkSession, media: DataFrame) -> DataFrame:
    """Deterministic 'decoder': byte length, first byte, byte-sum mod
    256 — computed in an Arrow-batched pandas iterator with the exact
    shape a real decoder would use (one binary column in, typed
    feature columns out)."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            # a NULL media blob decodes as the EMPTY payload — a None
            # would TypeError every len/sum below (edge-events test)
            blobs = pdf["blob"].map(lambda b: b if b is not None else b"")
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "n_bytes": blobs.map(len),
                    "first_byte": blobs.map(lambda b: b[0] if len(b) else -1),
                    "byte_sum_mod": blobs.map(lambda b: sum(b) % 256),
                }
            )

    # Repartition before the Python stage: decode cost is per-byte,
    # not per-row, so parallelism must not be inherited from however
    # few parquet files the scan produced.
    return media.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        decode, DECODE_OUT_SCHEMA
    )


@register(
    "multimodal_fake_decode",
    survey_ids=(),
    oracle="""
WITH p AS (SELECT event_id, coalesce(props, '') AS props FROM events)
SELECT event_id,
       CAST(length(props) AS BIGINT) AS n_bytes,
       CAST(CASE WHEN length(props) > 0
            THEN ascii(substring(props, 1, 1)) ELSE -1 END AS BIGINT) AS first_byte,
       CAST(CASE WHEN length(props) > 0 THEN list_reduce(
            list_transform(range(1, length(props) + 1),
                           i -> ascii(substring(props, i, 1))),
            (acc, x) -> (acc + x) % 256) % 256
            ELSE 0 END AS BIGINT) AS byte_sum_mod
FROM p
""",
    doc="The multimodal decode pattern end-to-end with a fake decoder: "
    "binary column (props bytes) -> repartition -> mapInPandas Arrow "
    "batches -> typed feature columns. Swap fake_byte_features for a "
    "real decoder (decode_image_real) when the codec libs exist.",
)
def multimodal_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    media = ev.select("event_id", F.col("props").cast("binary").alias("blob"))
    return fake_byte_features(spark, media)


FRAME_BYTES = 4
FRAME_STRIDE = 2  # keep every 2nd frame


def resize_image_real(blob: bytes, width: int, height: int) -> bytes:
    """Real resize stub: would decode, resample, re-encode. Imaging
    libs are absent in this container — see module docstring."""
    raise NotImplementedError(
        "image resize requires an imaging library not present in this container"
    )


@register(
    "multimodal_frame_sample",
    survey_ids=(),
    oracle=f"""
WITH idx AS (
  SELECT event_id, props,
         unnest(range(0, CAST(ceil(length(props)
           / {FRAME_BYTES * FRAME_STRIDE}.0) AS INTEGER))) AS frame_no
  FROM events
)
SELECT event_id, CAST(frame_no AS BIGINT) AS frame_no,
       substring(props, (frame_no * {FRAME_BYTES * FRAME_STRIDE}) + 1,
                 {FRAME_BYTES}) AS frame
FROM idx
WHERE length(substring(props, (frame_no * {FRAME_BYTES * FRAME_STRIDE}) + 1,
             {FRAME_BYTES})) > 0
""",
    doc="Video-style frame sampling on an opaque binary column: the "
    "payload is cut into fixed-size frames and every STRIDE-th frame "
    "is kept — one Arrow-batched pass (mapInPandas), emitting "
    "(event_id, frame_no, frame). The real decoder would replace the "
    "byte-slicing with codec calls; schema, batching, and the "
    "explode shape are the production plumbing.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator  # noqa: PLC0415

    ev = t(spark, sf_dir, "events").select(
        "event_id", F.col("props").cast("binary").alias("blob")
    )
    out_schema = "event_id bigint, frame_no bigint, frame string"
    step = FRAME_BYTES * FRAME_STRIDE

    def sample(batches: Iterator) -> Iterator:
        # Strided frame cutting, vectorized (round-3 verdict #4): the
        # repeat/arange index arithmetic replaces the per-row Python
        # loop — offsets for EVERY frame of the batch are computed in
        # four numpy ops over one concatenated buffer; the only
        # remaining per-frame Python is the utf-8 decode a real codec
        # call would replace anyway.
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "frame_no": pd.Series([], dtype="int64"),
                "frame": pd.Series([], dtype="object"),
            }
        )
        for pdf in batches:
            # NULL blob == empty payload: yields no frames (matches the
            # oracle, whose range over length(NULL) unnests to nothing)
            blobs = [b if b is not None else b"" for b in pdf["blob"].tolist()]
            if not blobs:
                yield empty
                continue
            ids = pdf["event_id"].to_numpy(dtype=np.int64)
            lens = np.fromiter(
                (len(b) for b in blobs), dtype=np.int64, count=len(blobs)
            )
            # every stride offset < len yields a non-empty chunk
            n_frames = (lens + (step - 1)) // step
            total = int(n_frames.sum())
            if total == 0:
                yield empty
                continue
            firsts = np.cumsum(n_frames) - n_frames
            frame_no = np.arange(total, dtype=np.int64) - np.repeat(firsts, n_frames)
            base = np.cumsum(lens) - lens  # row offsets in the joined buffer
            starts = np.repeat(base, n_frames) + frame_no * step
            ends = np.minimum(
                starts + FRAME_BYTES, np.repeat(base + lens, n_frames)
            )
            buf = memoryview(b"".join(blobs))
            frames = [
                bytes(buf[s:e]).decode("utf-8", errors="replace")
                for s, e in zip(starts.tolist(), ends.tolist())
            ]
            yield pd.DataFrame(
                {
                    "event_id": np.repeat(ids, n_frames),
                    "frame_no": frame_no,
                    "frame": frames,
                }
            )

    return ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        sample, out_schema
    )


N_FEATURES = 8


@register(
    "multimodal_feature_embed",
    survey_ids=(),
    # Byte-based oracle (round-3 ADVICE): the Spark plan histograms
    # UTF-8 BYTES (np.frombuffer over the binary cast), so the oracle
    # must too — `ascii(substring(props, i, 1))` histograms CHARACTER
    # codepoints and only agreed because the fixture props are pure
    # ASCII. Here the UTF-8 bytes are recovered engine-neutrally from
    # `to_hex(encode(props))` (two hex digits per byte), so parity
    # holds for any input, and the normalization denominator is
    # octet_length, not character length.
    oracle=f"""
WITH h AS (
  SELECT event_id, to_hex(encode(coalesce(props, ''))) AS hx,
         octet_length(encode(coalesce(props, ''))) AS nb
  FROM events
),
b AS (
  SELECT event_id, nb,
         list_transform(range(1, nb + 1),
           i -> (strpos('0123456789ABCDEF', substring(hx, 2*i - 1, 1)) - 1) * 16
              + (strpos('0123456789ABCDEF', substring(hx, 2*i, 1)) - 1)) AS bytes
  FROM h
)
SELECT event_id,
       {", ".join(
           f"round(len(list_filter(bytes, x -> x % {N_FEATURES} = {k})) * 1.0"
           f" / greatest(nb, 1), 4) AS f{k}"
           for k in range(N_FEATURES)
       )}
FROM b
""",
    doc="Media feature extraction: opaque binary -> fixed-dim feature "
    "vector (normalized byte-class histogram) in one Arrow-batched "
    "numpy pass — the bridge from the multimodal tier to the "
    "similarity tier (these vectors feed the same ANN operators as "
    "the embeddings table). A real extractor would replace the "
    "histogram with a model forward pass; batch shape, repartition "
    "and typed output schema are the production plumbing.",
)
def multimodal_feature_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np  # noqa: PLC0415

    ev = t(spark, sf_dir, "events").select(
        "event_id", F.col("props").cast("binary").alias("blob")
    )
    out_schema = "event_id bigint, " + ", ".join(
        f"f{k} double" for k in range(N_FEATURES)
    )

    def extract(batches: Iterator) -> Iterator:
        # one bincount for the whole batch: byte classes are offset by
        # row index so row k's histogram lands in slots [8k, 8k+8)
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            # NULL blob == empty payload -> all-zero histogram
            blobs = [b if b is not None else b"" for b in pdf["blob"].tolist()]
            n_rows = len(blobs)
            lens = np.fromiter(
                (len(b) for b in blobs), dtype=np.int64, count=n_rows
            )
            arr = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            row_of = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
            hist = np.bincount(
                row_of * N_FEATURES + (arr % N_FEATURES),
                minlength=n_rows * N_FEATURES,
            ).reshape(n_rows, N_FEATURES)
            feats = np.round(
                hist / np.maximum(lens, 1)[:, None], 4
            )
            out = {"event_id": pdf["event_id"]}
            for k in range(N_FEATURES):
                out[f"f{k}"] = feats[:, k]
            yield pd.DataFrame(out)

    return ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        extract, out_schema
    )
