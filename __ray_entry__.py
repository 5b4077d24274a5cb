"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init``/``ray.shutdown`` here or in the library code these
functions reach (sources/corpus.py, pipelines/*).

``entry()``: flagship crawl-and-extract pipeline over the synthetic
corpus derived from /root/testdata/sf0.001 — BFS frontier (sharded
cuckoo URL-seen actors, politeness+robots shards), corpus-join fetch,
zero-copy Arrow extract kernel.

``queries()`` / ``oracle_sql()``: one entry per implemented operator
from SURVEY.md §2; the corpus is a pure function of the ``documents``
table so even crawl reachability and byte-identical extracted text are
SQL-checkable (see crawl4ai_ray/pipelines/oracles.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: depth-3 BFS crawl over the sf0.001 corpus; returns
    the ordered crawl log (url, depth, success, text, ...)."""
    from crawl4ai_ray.pipelines.queries import _run_bfs

    crawler = _run_bfs("/root/testdata/sf0.001")
    import pandas as pd

    return crawler.crawl_log().to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from crawl4ai_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from crawl4ai_ray.pipelines.oracles import ORACLES

    return dict(ORACLES)
