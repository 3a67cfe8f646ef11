"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing in
here (or in libfilter_ray) calls ray.init()/ray.shutdown().

- entry(): flagship pipeline (web-page synthesis -> byte-identical extract ->
  per-lang mergeable BlockBloom build -> probe report) on sf0.001.
- queries(): one callable per implemented pipeline (SURVEY.md §2); each takes
  sf_dir and returns a DataFrame/Dataset/Table.
- oracle_sql(): DuckDB-equivalent SQL for the exact (non-sketch) pipelines;
  sketch pipelines are approximate and covered by error-bound tests instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from libfilter_ray.context import apply_scale_defaults
from libfilter_ray.pipelines import queries as _q

# entry-point context posture (push-based sort exchange — the pull-based
# default leaks driver heap per shuffled byte; libfilter_ray/context.py)
apply_scale_defaults()


def entry() -> Any:
    from libfilter_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
