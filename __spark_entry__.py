"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the politeness fetch-schedule
over a synthetic frontier) on sf0.001; ``queries()``/``oracle_sql()``
expose every implemented operator from SURVEY.md §2 with DuckDB oracle
SQL where ANSI SQL can express the semantics (murmur3 hashing, bloom
probes, HTML parsing and the iterative crawl loop are rows-only — the
pure-Python reference mirror covers those in tests/test_frontier.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# local-mode Python workers need the package importable too
_pkg_root = os.path.dirname(os.path.abspath(__file__))
_pypath = os.environ.get("PYTHONPATH", "")
if _pkg_root not in _pypath.split(os.pathsep):
    os.environ["PYTHONPATH"] = _pkg_root + (os.pathsep + _pypath if _pypath else "")

from pubcrawler_spark.queries import ORACLES, QUERIES  # noqa: E402

_shipped: set[int] = set()


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """The driver may have started its SparkSession before importing this
    module, in which case local-mode Python workers inherited an env
    without our PYTHONPATH. Shipping the package as a zip via addPyFile
    works regardless of session start order."""
    key = id(spark.sparkContext)
    if key in _shipped:
        return
    import hashlib
    import shutil
    import tempfile

    # key the zip on a content hash of the package sources so a source
    # edit never ships a stale package to the Python workers
    pkg_dir = os.path.join(_pkg_root, "pubcrawler_spark")
    digest = hashlib.sha256()
    for root, _dirs, files in sorted(os.walk(pkg_dir)):
        for fname in sorted(files):
            if fname.endswith(".py"):
                p = os.path.join(root, fname)
                digest.update(os.path.relpath(p, pkg_dir).encode())
                with open(p, "rb") as fh:
                    digest.update(fh.read())
    zip_base = os.path.join(
        tempfile.gettempdir(), f"pubcrawler_spark_pkg_{digest.hexdigest()[:16]}"
    )
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        staging = tempfile.mkdtemp(prefix="pkg_stage_")
        shutil.copytree(pkg_dir, os.path.join(staging, "pubcrawler_spark"))
        shutil.make_archive(zip_base, "zip", staging)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already added in this context
    _shipped.add(key)


def _wrap(fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_workers_can_import(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic politeness fetch-schedule (canonicalize
    UDF → salted per-host top-k window → global crawl order) on the
    sf0.001 events-derived frontier."""
    _ensure_workers_can_import(spark)
    return QUERIES["q26_politeness_schedule"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Oracle-backed queries are listed first (stable within each group):
    the driver's correctness gate samples a bounded prefix of this dict,
    so the designed rows-only entries (no ANSI-SQL oracle exists; each is
    pinned by the reference mirror or value-level pytest instead) must
    not displace oracle-checkable ones out of the window."""
    ordered = sorted(QUERIES, key=lambda name: name not in ORACLES)
    return {name: _wrap(QUERIES[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-expressible query."""
    return dict(ORACLES)
