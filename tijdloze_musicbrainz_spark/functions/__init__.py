from .normalize import clean, search_key, unaccent
from .scoring import (
    canonical_sort_key,
    is_compilation,
    is_main_album,
    is_single,
    is_soundtrack,
    relevance_generation,
    relevance_query,
)

__all__ = [
    "unaccent",
    "search_key",
    "clean",
    "canonical_sort_key",
    "relevance_generation",
    "relevance_query",
    "is_main_album",
    "is_compilation",
    "is_soundtrack",
    "is_single",
]
