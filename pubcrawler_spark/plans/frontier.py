"""Frontier crawl engine: iterative batch loop with atomic checkpoints
(SURVEY.md §3.4, K8/X4).

Each iteration is a pure function of the previous checkpoint:

    frontier@K-1, seen@K-1, budgets
      → canonicalize+hash (Arrow UDF)         [urltools]
      → dedup per url_canon                   [schedule.dedup_candidates]
      → anti-join seen set (exact or bloom)   [seen]
      → robots split                          [schedule.split_robots]
      → salted per-host top-k + global seq    [schedule.pick_schedule]
      → join pages on url_canon (J5)          [simulated fetch]
      → parse UDF (V3) → parsed rows + out-links → frontier@K
      → seen@K = seen@K-1 ∪ scheduled ∪ robots-disallowed
      → metrics@K (per-partition lineage)
      → atomic commit of checkpoints/iter=K/

Checkpointing is an Iceberg-snapshot stand-in (no Iceberg runtime jar in
this sandbox — SURVEY.md §7.0): each iteration writes parquet state dirs
under ``iter=K.tmp/`` and commits with a single atomic directory rename
plus a ``_manifest.json`` carrying row counts and per-partition lineage.
Resume scans for the max committed K and continues at K+1; determinism
of the schedule (total order W4) makes the resumed run byte-equal to an
uninterrupted one (tested in tests/test_frontier.py).

At cluster scale the same layout maps 1:1 onto Iceberg table snapshots
(append ``parsed``/``metrics``, overwrite ``frontier``/``seen``).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from pubcrawler_spark.functions.urltools import with_canonical_url
from pubcrawler_spark.operators import schedule as sched
from pubcrawler_spark.operators import seen as seen_mod
from pubcrawler_spark.operators.parse import parse_pages

STATE_TABLES = ("frontier", "seen", "schedule", "parsed", "metrics")


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame,
        seeds: list[str],
        checkpoint_dir: str,
        year: int | str,
        host_budget: int = 10,
        seen_mode: str = "exact",
        n_bloom_shards: int = 32,
        salt_rows: int = 50_000,
    ) -> None:
        self.spark = spark
        self.year = year
        self.host_budget = host_budget
        self.seen_mode = seen_mode
        self.n_bloom_shards = n_bloom_shards
        self.salt_rows = salt_rows
        self.ckpt = checkpoint_dir
        self.seeds = seeds
        self.robots_rules = sched.parse_robots_rules(robots).cache()
        # fetch-side table: canonical url is the join key (J5). At real
        # scale `pages` is the Iceberg corpus partitioned by
        # bucket(url_hash); here we pre-compute the canonical key once.
        self.pages = (
            with_canonical_url(pages)
            .select("url", "url_canon", "html")
            .repartition("url_canon")
            .cache()
        )

    # -- checkpoint plumbing -------------------------------------------------

    def _iter_dir(self, k: int) -> str:
        return os.path.join(self.ckpt, f"iter={k}")

    def committed_iterations(self) -> list[int]:
        if not os.path.isdir(self.ckpt):
            return []
        out = []
        for name in os.listdir(self.ckpt):
            if name.startswith("iter=") and not name.endswith(".tmp"):
                if os.path.exists(os.path.join(self.ckpt, name, "_manifest.json")):
                    out.append(int(name.split("=")[1]))
        return sorted(out)

    def _commit(self, k: int, dfs: dict[str, DataFrame], counts: dict[str, int]) -> None:
        tmp = self._iter_dir(k) + ".tmp"
        final = self._iter_dir(k)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        for name, df in dfs.items():
            df.write.mode("overwrite").parquet(os.path.join(tmp, name))
        manifest = {
            "iteration": k,
            "counts": counts,
            "lineage": {
                name: sorted(
                    f for f in os.listdir(os.path.join(tmp, name)) if f.startswith("part-")
                )
                for name in dfs
            },
        }
        with open(os.path.join(tmp, "_manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=1)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)  # atomic commit

    def _read(self, k: int, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._iter_dir(k), name))

    # -- iteration -----------------------------------------------------------

    def _initial_frontier(self) -> DataFrame:
        rows = [(u, 1.0, 0, i) for i, u in enumerate(self.seeds)]
        df = self.spark.createDataFrame(rows, "url string, priority double, depth int, seq long")
        return with_canonical_url(df).select(*_frontier_cols())

    def run(self, max_iterations: int, resume: bool = False) -> dict:
        done = self.committed_iterations()
        if resume and done:
            start = done[-1] + 1
            frontier = self._read(done[-1], "frontier")
            seen = self._read(done[-1], "seen")
        else:
            if os.path.exists(self.ckpt):
                shutil.rmtree(self.ckpt)
            os.makedirs(self.ckpt, exist_ok=True)
            start = 0
            frontier = self._initial_frontier()
            seen = self.spark.createDataFrame([], seen_mod.SEEN_SCHEMA)

        totals = {"scheduled": 0, "parsed": 0, "iterations": 0}
        for k in range(start, max_iterations):
            t0 = time.monotonic()
            result = self._one_iteration(k, frontier, seen)
            if result is None:
                break
            frontier, seen, counts = result
            counts["wall_ms"] = int((time.monotonic() - t0) * 1000)
            totals["scheduled"] += counts["scheduled"]
            totals["parsed"] += counts["parsed"]
            totals["iterations"] += 1
        return totals

    def _one_iteration(self, k: int, frontier: DataFrame, seen: DataFrame):
        cand = sched.dedup_candidates(frontier)

        if self.seen_mode == "bloom" and not seen.isEmpty():
            shards = seen_mod.build_bloom_shards(seen, self.n_bloom_shards)
            unseen = seen_mod.filter_unseen_bloom(cand, shards, self.n_bloom_shards)
        else:
            unseen = seen_mod.filter_unseen_exact(cand, seen)

        allowed, disallowed = sched.split_robots(unseen, self.robots_rules)
        schedule = sched.pick_schedule(
            allowed, self.host_budget, k, salt_rows=self.salt_rows
        ).cache()
        n_sched = schedule.count()
        if n_sched == 0:
            return None

        # simulated fetch: schedule ⋈ pages on url_canon (left: misses = fetch failures)
        fetched = schedule.join(self.pages.select("url_canon", "html"), "url_canon", "left")
        parsed_full = parse_pages(fetched, self.year, url_col="url_canon").cache()

        parsed_records = parsed_full.filter(F.col("parsed.id").isNotNull()).select(
            "url_canon",
            "parsed.id",
            "parsed.title",
            "parsed.authors",
            "parsed.abstract",
            "parsed.pdf_url",
            "parsed.source_url",
            "parsed.text",
            F.lit(k).alias("iteration"),
        )

        # frontier expansion: discovered links with deterministic child seq
        links = parsed_full.select(
            "priority",
            "depth",
            "disc_seq",
            F.posexplode_outer("parsed.links").alias("pos", "url"),
        ).filter(F.col("url").isNotNull())
        new_frontier = with_canonical_url(
            links.select(
                "url",
                (F.col("priority") * 0.5).alias("priority"),
                (F.col("depth") + 1).alias("depth"),
                (F.col("disc_seq") * 100_000 + F.col("pos")).alias("seq"),
            )
        ).select(*_frontier_cols())

        # leftover candidates (budget-deferred) stay in the frontier
        leftover = allowed.join(
            schedule.select("url_canon"), "url_canon", "left_anti"
        ).select(*_frontier_cols())
        next_frontier = leftover.unionByName(new_frontier)

        new_seen = (
            schedule.select("url_hash", "url_canon")
            .unionByName(disallowed.select("url_hash", "url_canon"))
            .unionByName(seen)
            .dropDuplicates(["url_hash"])
        )

        n_parsed = parsed_records.count()
        n_disallowed = disallowed.count()
        metrics = (
            parsed_full.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count("*").alias("scheduled"),
                F.count(F.col("parsed.id")).alias("parsed"),
            )
            .withColumn("iteration", F.lit(k))
            .withColumn("skipped_robots", F.lit(n_disallowed))
        )

        counts = {
            "scheduled": n_sched,
            "parsed": n_parsed,
            "skipped_robots": n_disallowed,
        }
        out_schedule = schedule.select(
            "iteration", "seq", "url_canon", "host", "priority", "depth", "url_hash"
        )
        self._commit(
            k,
            {
                "frontier": next_frontier,
                "seen": new_seen,
                "schedule": out_schedule,
                "parsed": parsed_records,
                "metrics": metrics,
            },
            counts,
        )
        # read back committed state (cuts lineage like Iceberg snapshot reads)
        frontier_next = self._read(k, "frontier")
        seen_next = self._read(k, "seen")
        schedule.unpersist()
        parsed_full.unpersist()
        return frontier_next, seen_next, counts

    # -- readers over the full run --------------------------------------------

    def full_schedule(self) -> DataFrame:
        dirs = [os.path.join(self._iter_dir(k), "schedule") for k in self.committed_iterations()]
        return self.spark.read.parquet(*dirs)

    def full_parsed(self) -> DataFrame:
        dirs = [os.path.join(self._iter_dir(k), "parsed") for k in self.committed_iterations()]
        return self.spark.read.parquet(*dirs)

    def final_seen(self) -> DataFrame:
        k = self.committed_iterations()[-1]
        return self._read(k, "seen")


def _frontier_cols():
    return ("url", "url_canon", "url_hash", "host", "priority", "depth", "seq")
