"""osmlint — a Ray-Data-native spatial validate-and-flag (lint) engine.

From-scratch re-expression of the capabilities of
stalker314314/serbian-osm-lint (reference at /root/reference, read-only)
as vectorized span-document kernels composed into ray.data.Dataset
pipelines.  Nothing in this package calls ray.init()/ray.shutdown();
sessions are owned by bench.py / tests / the driver.
"""

__version__ = "0.1.0"

from .caches import clear_caches  # noqa: E402  (public cache reset)
