"""Scoring + canonical-selection key builders (SURVEY §2.8 F7-F9, P11).

These are the reference's core client-side algorithms re-expressed as
pure column expressions (no UDFs):

- album-type predicates from the secondary-type array
  (``/root/reference/src/main.py:30-37``)
- the 3-component lexicographic canonical sort key
  (``src/main.py:50-73``; semantics documented in README.md:39-40)
- relevance scoring v1 (generation, ``src/main.py:42-48``) and v2
  (query path, ``src/benchmark.py:43-49``)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# MusicBrainz enum semantics (src/main.py:30-37):
#   release_group.type: 1 = album, 2 = single
#   secondary_type:     1 = compilation, 2 = soundtrack
ALBUM, SINGLE = 1, 2
COMPILATION, SOUNDTRACK = 1, 2


def _arr(sec_types: Column) -> Column:
    # collect_list of an empty group yields NULL, not [] — normalize
    # (SURVEY F16 pitfall).
    return F.coalesce(sec_types, F.array().cast("array<int>"))


def is_main_album(rg_type: Column, sec_types: Column) -> Column:
    """type == album AND no secondary types (src/main.py:30-32)."""
    return (rg_type == ALBUM) & (F.size(_arr(sec_types)) == 0)


def is_compilation(rg_type: Column, sec_types: Column) -> Column:
    """type == album AND compilation secondary (src/main.py:33-34 —
    the release_type==1 guard is part of the predicate: a SINGLE with
    a compilation secondary type is NOT a compilation album)."""
    return (rg_type == ALBUM) & F.array_contains(_arr(sec_types), COMPILATION)


def is_soundtrack(rg_type: Column, sec_types: Column) -> Column:
    """type == album AND soundtrack secondary (src/main.py:36-37)."""
    return (rg_type == ALBUM) & F.array_contains(_arr(sec_types), SOUNDTRACK)


def is_single(rg_type: Column) -> Column:
    return rg_type == SINGLE


def canonical_sort_key(
    release_year: Column,
    is_single_from: Column,
    main_album: Column,
    soundtrack: Column,
    compilation: Column,
) -> tuple[Column, Column, Column]:
    """The 3-tuple lexicographic argmin key (src/main.py:50-73).

    1. ``year_value``: NULL year → 9999 sentinel; a release-group that
       is the explicit "single from" target or a main album keeps its
       year; anything else (singles, compilations, …) is penalized one
       year, so a single released a year early loses to the album but
       a single two years early wins (README.md:39).
    2. ``ref_priority``: explicit single-from relation beats everything
       at equal year.
    3. ``type_priority``: main album < soundtrack < compilation < other.
    """
    # NULL year is 9999 UNCONDITIONALLY (src/main.py:51-52) — it must
    # not also take the +1 penalty, or a NULL-year compilation would
    # sort after a 9998-year "other" instead of tying on year_value.
    year_value = (
        F.when(release_year.isNull(), F.lit(9999))
        .when(is_single_from | main_album, release_year)
        .otherwise(release_year + 1)
    )
    ref_priority = F.when(is_single_from, 0).otherwise(1)
    type_priority = (
        F.when(main_album, 1)
        .when(soundtrack, 2)
        .when(compilation, 3)
        .otherwise(4)
    )
    return (
        year_value.alias("year_value"),
        ref_priority.alias("ref_priority"),
        type_priority.alias("type_priority"),
    )


def relevance_generation(exact_match: Column, score: Column) -> Column:
    """v1 (src/main.py:42-48): exact key match keeps the score, a
    prefix/fuzzy match is worth a tenth."""
    return F.when(exact_match, score.cast("double")).otherwise(score / 10.0)


def relevance_query(
    score: Column,
    is_single_from: Column,
    main_album: Column,
    exact_match: Column,
) -> Column:
    """v2 (src/benchmark.py:43-49): multiplicative boosts —
    score × 10^[single_from] × 10^[main_album] × 10^[exact]."""
    boost = lambda flag: F.when(flag, F.lit(10.0)).otherwise(F.lit(1.0))  # noqa: E731
    return (
        score.cast("double")
        * boost(is_single_from)
        * boost(main_album)
        * boost(exact_match)
    )
