"""clann_tpu — a TPU-native clustered LSH nearest-neighbor framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference CLANN (enricobolzonello/clann: greedy min-max clustering +
per-cluster PUFFINN LSH with delta-recall adaptive queries). See SURVEY.md
for the reference structural analysis and README.md for the design.

Public facade mirrors the reference API (reference: src/lib.rs:41-264).
"""

from clann_tpu.api import (
    Clann,
    build,
    init,
    init_from_file,
    init_with_config,
    insert,
    rebuild,
    save_metrics,
    search,
    serialize,
)
from clann_tpu.config import Config, MetricsGranularity, MetricsOutput
from clann_tpu.parallel.capacity import CapacityPlan, plan_capacity
from clann_tpu.errors import (
    ClusteredIndexError,
    ConfigError,
    DataError,
    IndexCreationError,
    IndexNotFoundError,
    IndexOutOfBoundsError,
    IndexSearchError,
    MetricsError,
    ResultDBError,
    SerializeError,
)

__version__ = "0.1.0"

__all__ = [
    "Clann",
    "Config",
    "MetricsGranularity",
    "MetricsOutput",
    "CapacityPlan",
    "plan_capacity",
    "init",
    "init_with_config",
    "init_from_file",
    "build",
    "insert",
    "rebuild",
    "search",
    "serialize",
    "save_metrics",
    "ClusteredIndexError",
    "ConfigError",
    "DataError",
    "IndexCreationError",
    "IndexNotFoundError",
    "IndexOutOfBoundsError",
    "IndexSearchError",
    "MetricsError",
    "ResultDBError",
    "SerializeError",
    "__version__",
]
