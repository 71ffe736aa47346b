"""Named query plans registered for the driver contract (__spark_entry__.py).

Importing this package imports every plan module, which registers each query
builder (and its DuckDB oracle SQL, when SQL-expressible) into the registry.
"""

from .registry import all_oracles, all_queries, get_query, query

from . import reference  # noqa: E402,F401  (registration side effects)
from . import relational  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import flagship  # noqa: E402,F401
from . import training  # noqa: E402,F401
from . import stats  # noqa: E402,F401
from . import sources_io  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import geo  # noqa: E402,F401

__all__ = ["all_oracles", "all_queries", "get_query", "query"]
