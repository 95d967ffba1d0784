"""rdfx_ray: Ray-Data-native knowledge-graph construction engine."""

import os as _os

# Guard nested parallelism: Ray schedules many tasks per node; a
# machine-width polars thread pool per worker process oversubscribes
# the node. Must be set before polars' first import in each process
# (workers import this package when deserializing kernels).
_os.environ.setdefault("POLARS_MAX_THREADS", "4")

__version__ = "0.1.0"
