"""Deterministic FIXTURES.md §B-shaped MusicBrainz world, used by the
end-to-end pipeline tests AND the registered golden query
(``mb_pipeline_canonical_e2e``). The scenarios encode the reference's
documented counterexamples (README.md:39-41):

- r200 "Song A": single 1 year before the album  -> album rg101 wins
- r201 "Song B": single 2 years early            -> single rg102 wins
                 (plus a bootleg that must not contribute years)
- r202 "Song C": single-from-linked compilation beats plain comp
- r203 "Song D": VA-soundtrack-only recording, duet second artist
- r204 "Song E": NULL release year everywhere    -> dropped
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TABLES: dict[str, tuple[list, str]] = {
    "area": ([(1,), (2,), (3,), (4,), (5,), (6,)], "id int"),
    "iso_3166_1": ([(1, "BE"), (5, "NL")], "area int, code string"),
    "l_area_area": (
        [(118734, 1, 2), (118734, 4, 3), (118734, 5, 4), (99999, 5, 6)],
        "link int, entity0 int, entity1 int",
    ),
    "artist": (
        [
            (10, "a10", "Gorki", 2),
            (11, "a11", "Nirvana", 3),
            (12, "a12", "Various Artists", 6),
            (13, "a13", "Luc De Vos", 6),
        ],
        "id int, gid string, name string, area int",
    ),
    "l_artist_url": (
        [(11, 9000 + i) for i in range(9)],
        "entity0 int, entity1 int",
    ),
    "artist_alias": ([(10, "Gorky")], "artist int, name string"),
    "link": ([(500, 103), (501, 11), (502, 99)], "id int, link_type int"),
    "link_attribute": ([(500, 1094)], "link int, attribute_type int"),
    "l_artist_artist": ([(500, 13, 10)], "link int, entity0 int, entity1 int"),
    "artist_credit": ([(20,), (21,), (22,)], "id int"),
    "artist_credit_name": (
        [
            (20, 0, 11, "Nirvana"),
            (21, 0, 12, "Various Artists"),
            (22, 0, 11, "Nirvana"),
            (22, 1, 10, "Gorki"),
        ],
        "artist_credit int, position int, artist int, name string",
    ),
    "release_group": (
        [
            (100, "rg100", "Song A", 2, 20),
            (101, "rg101", "Album One", 1, 20),
            (102, "rg102", "Song B", 2, 20),
            (103, "rg103", "Album Two", 1, 20),
            (104, "rg104", "Best Of", 1, 20),
            (105, "rg105", "Song C", 2, 20),
            (106, "rg106", "Singles Collection", 1, 20),
            (107, "rg107", "Movie OST", 1, 21),
            (108, "rg108", "Null Year EP", 2, 20),
        ],
        "id int, gid string, name string, type int, artist_credit int",
    ),
    "release_group_secondary_type_join": (
        [(104, 1), (106, 1), (107, 2)],
        "release_group int, secondary_type int",
    ),
    "l_rg_rg": (
        [(105, 106, 501), (100, 101, 502)],
        "entity0 int, entity1 int, link int",
    ),
    "release": (
        [
            (300, 100, 1),
            (301, 101, 1),
            (302, 102, 1),
            (303, 103, 1),
            (304, 103, 2),
            (305, 104, 1),
            (306, 106, 1),
            (307, 107, 1),
            (308, 108, 1),
            # trackless 1985 bootleg of Album One: must NOT affect the
            # canonical pick (official-only spine) but MUST set
            # mb_album.release_year (group-wide, no status filter)
            (309, 101, 2),
        ],
        "id int, release_group int, status int",
    ),
    "release_country": (
        [
            (300, 1990),
            (301, 1991),
            (302, 1990),
            (303, 1992),
            (304, 1990),
            (305, 1995),
            (306, 1995),
            (307, 1997),
            (308, None),
            (309, 1985),
        ],
        "release int, date_year int",
    ),
    "medium": ([(400 + i, 300 + i) for i in range(9)], "id int, release int"),
    "recording": (
        [
            (200, "r200", "Song A", 20),
            (201, "r201", "Song B", 20),
            (202, "r202", "Song C", 20),
            (203, "r203", "Song D", 22),
            (204, "r204", "Song E", 20),
        ],
        "id int, gid string, name string, artist_credit int",
    ),
    "track": (
        [
            (600, 400, 200),
            (601, 401, 200),
            (602, 402, 201),
            (603, 403, 201),
            (604, 404, 201),
            (605, 405, 202),
            (606, 406, 202),
            (607, 407, 203),
            (608, 408, 204),
        ],
        "id int, medium int, recording int",
    ),
    "l_recording_work": (
        [(200, 300, 0), (200, 301, 5)],
        "entity0 int, entity1 int, link_order int",
    ),
    "work": (
        [(300, "w300", "Work A"), (301, "w301", "Ignored Work")],
        "id int, gid string, name string",
    ),
    "work_alias": ([(300, "Werk Ä")], "work int, name string"),
    # languages: 1 = English (usable), 2 = "no language" zxx (usable
    # via iso_code_3), 3 = iso_code_1-less real language (NOT usable)
    "language": (
        [(1, "en", "eng"), (2, None, "zxx"), (3, None, "abc")],
        "id int, iso_code_1 string, iso_code_3 string",
    ),
    "work_language": ([(300, 1), (301, 3)], "work int, language int"),
    "recording_alias": ([(200, "Song A (live)")], "recording int, name string"),
}


def musicbrainz_fixture_tables(spark: SparkSession) -> dict[str, DataFrame]:
    # VALUES relations, not createDataFrame: see plans/util.values_df
    # (zero-task JVM LocalRelations; the composed fixture e2e dropped
    # 10.7 s -> 3.3 s solo when the ~30 tiny tables stopped being
    # Python-evaluated parallelize scans).
    from .plans.util import values_df  # noqa: PLC0415

    return {
        name: values_df(spark, rows, schema)
        for name, (rows, schema) in _TABLES.items()
    }
