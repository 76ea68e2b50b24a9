"""Non-ASCII parity for the multimodal byte-level operators.

Round-3 ADVICE: multimodal_feature_embed's old oracle histogrammed
per-CHARACTER codepoints and only agreed with the byte-histogramming
Spark plan because the fixture props are pure ASCII. The oracle is now
byte-based (to_hex(encode(props)) + octet_length); this test pins the
parity on input the testdata can't provide — multi-byte UTF-8."""

from __future__ import annotations

import duckdb
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tijdloze_musicbrainz_spark.plans import REGISTRY


def _canon(rows, cols):
    return sorted(
        tuple(repr(r[c] if isinstance(r, dict) else r.asDict()[c]) for c in sorted(cols))
        for r in (x.asDict() if hasattr(x, "asDict") else x for x in rows)
    )


def test_feature_embed_oracle_parity_on_non_ascii(spark, sf_dir, tmp_path):
    src = pq.read_table(f"{sf_dir}/events.parquet")
    # splice multi-byte UTF-8 (2-, 3- and 4-byte sequences) into props
    n = src.num_rows
    props = src.column("props").to_pylist()
    for i in range(0, min(n, 50)):
        props[i] = f'{{"tag": "héllo wörld 日本語 🎵 #{i}"}}'
    table = src.set_column(
        src.schema.get_field_index("props"), "props", pc.cast(props, "string")
    )
    out_dir = tmp_path / "unicode_world"
    out_dir.mkdir()
    pq.write_table(table, out_dir / "events.parquet")

    spec = REGISTRY["multimodal_feature_embed"]
    sdf = spec.builder(spark, str(out_dir))
    got = _canon(sdf.collect(), sdf.columns)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{out_dir}/events.parquet'"
    )
    res = con.execute(spec.oracle)
    cols = [d[0] for d in res.description]
    want = _canon([dict(zip(cols, r)) for r in res.fetchall()], cols)
    assert got == want
