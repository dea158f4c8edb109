from .registry import QuerySpec, REGISTRY, register, all_queries, all_oracle_sql  # noqa: F401

# Importing the query modules populates REGISTRY.
from . import queries_core  # noqa: F401,E402
from . import queries_ext  # noqa: F401,E402
from . import queries_ext2  # noqa: F401,E402
from . import queries_funcs  # noqa: F401,E402
from . import queries_llm  # noqa: F401,E402
from . import queries_tpch  # noqa: F401,E402
