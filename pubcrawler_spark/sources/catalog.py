"""S9 file-catalog scan: classify output CSVs by path pattern
(/root/reference/streamlit_app.py:80-143).

The reference walks ``output/metadata`` and ``output/trends`` and
classifies each CSV by filename/relative-path rules into
``summary_table`` / ``raw_data`` / ``analysis_other`` / ``trends``,
extracting (conference, year) from fixed path positions. Here the
listing is a catalog operation (driver-side walk — at scale this is an
Iceberg/metastore listing, not data IO) and the classification is pure
Catalyst expressions over the path strings, so a 10^6-file catalog
classifies in one narrow pass with no Python in the row loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def list_csv_files(spark: SparkSession, metadata_dir: str, trends_dir: str) -> DataFrame:
    """(path, dir_type, rel_path) rows for every CSV under the two
    roots — the ``rglob('*.csv')`` analog."""
    rows = []
    for dir_type, base in (("metadata", metadata_dir), ("trends", trends_dir)):
        if not os.path.isdir(base):
            continue
        for root, _dirs, files in os.walk(base):
            for fname in files:
                if fname.endswith(".csv"):
                    p = os.path.join(root, fname)
                    rows.append((p, dir_type, os.path.relpath(p, base)))
    return spark.createDataFrame(rows, "path string, dir_type string, rel_path string")


def classify_output_files(files: DataFrame) -> DataFrame:
    """Pure-expression port of the v1.8 rules (streamlit_app.py:103-127):

    1. metadata + 'analysis' in parts + name has '[4_]summary_table' →
       summary_table, year = parts[-3], conf = parts[-4]
    2. metadata + '_data_' in name → raw_data, year = parts[-2],
       conf = parts[-3]
    3. metadata + 'analysis' in parts → analysis_other (positions as 1)
    4. trends + exactly 2 parts → trends, year = 'Cross-Year',
       conf = parts[-2]

    Rows with no (conf, year) are dropped, like the reference.
    """
    parts = F.split(F.col("rel_path"), "/")
    nparts = F.size(parts)

    def _at(neg: int):
        # null-safe parts[-neg] (ANSI element_at throws on short paths;
        # the reference try/excepts those — F.get returns NULL instead)
        return F.get(parts, nparts - neg)

    fname = _at(1)
    in_analysis = F.array_contains(parts, "analysis")
    is_meta = F.col("dir_type") == "metadata"
    is_summary = is_meta & in_analysis & fname.contains("summary_table")
    is_raw = is_meta & fname.contains("_data_")
    is_other = is_meta & in_analysis
    is_trends = (F.col("dir_type") == "trends") & (nparts == 2)

    csv_type = (
        F.when(is_summary, F.lit("summary_table"))
        .when(is_raw, F.lit("raw_data"))
        .when(is_other, F.lit("analysis_other"))
        .when(is_trends, F.lit("trends"))
        .otherwise(F.lit("unknown"))
    )
    year = (
        F.when(is_summary | (is_other & ~is_raw), _at(3))
        .when(is_raw, _at(2))
        .when(is_trends, F.lit("Cross-Year"))
    )
    conf = (
        F.when(is_summary | (is_other & ~is_raw), _at(4))
        .when(is_raw, _at(3))
        .when(is_trends, _at(2))
    )
    return (
        files.select(
            "path", "dir_type",
            csv_type.alias("csv_type"),
            conf.alias("conference"),
            year.alias("year"),
        )
        .filter(F.col("conference").isNotNull() & F.col("year").isNotNull())
        .orderBy("path")
    )
