from .registry import REGISTRY, QuerySpec, oracle_sql_map, queries_map, register

# Import for side effects: each module registers its QuerySpecs.
from . import relational  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import analytic  # noqa: E402,F401
from . import fuzzy  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import dedup_index  # noqa: E402,F401
from . import cc_index  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import etl  # noqa: E402,F401
from . import formats  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import scaleops  # noqa: E402,F401
from . import mb_pipeline  # noqa: E402,F401
from . import replay  # noqa: E402,F401
from . import golden_shape  # noqa: E402,F401
from . import benchmark_real  # noqa: E402,F401
from ..streaming import jobs as _streaming_jobs  # noqa: E402,F401

# The driver's correctness check records only the first DRIVER_WINDOW_SIZE
# registrations; rank the registry so that window carries full SURVEY §2
# coverage (see priority.py and tests/test_registry_window.py).
from .priority import reorder_registry as _reorder_registry  # noqa: E402

_reorder_registry(REGISTRY)

__all__ = ["REGISTRY", "QuerySpec", "register", "queries_map", "oracle_sql_map"]
