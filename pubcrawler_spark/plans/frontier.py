"""Frontier crawl engine: iterative batch loop with atomic checkpoints
(SURVEY.md §3.4, K8/X4).

Each iteration is a pure function of the previous checkpoint:

    frontier@K-1, seen@K-1, budgets
      → canonicalize+hash (Arrow UDF)         [urltools]
      → dedup per url_canon                   [schedule.dedup_candidates]
      → anti-join seen set (exact or bloom)   [seen]
      → robots tag                            [schedule.tag_robots]
      → salted per-host top-k + global seq    [schedule.schedule_ranks]
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

Throughput engineering (north-star metric is URLs/sec):

- ONE Spark job per state table per iteration — no standalone
  ``count()`` actions; row counts come free from the parquet footers of
  the files just written (``_count_parquet``).
- Candidates are written first and read back, so every downstream
  consumer (schedule ranks, leftovers, seen update) reuses the
  materialized rows instead of re-running the canonicalize UDF and the
  seen probe. The schedule itself is materialized SLIM — a
  (url_canon, sched_seq) state table a few bytes per scheduled URL —
  instead of pinning the full schedule rows with an eager
  ``localCheckpoint`` (the r3 design): the write is ~50× smaller, the
  slim table broadcast-gates every consumption (fetch keys, the column
  join-back, the leftover anti-join — all broadcast probes under
  ``fetch_broadcast_limit``, distributed joins past it), and it is
  committed checkpoint state, so resume can re-derive what iteration K
  scheduled without recomputing windows.
- The fetch join broadcasts the (budget-bounded) schedule keys against
  the cached pages corpus — the corpus never shuffles.
- Small seen deltas (bounded by footer counts) are assembled
  driver-side with pyarrow from the tables already on disk — no fourth
  Spark job; the distributed write remains past
  ``bloom_delta_driver_limit`` and always in ``bloom_impl="table"``.
- ``skipped_seen`` needs an extra aggregation pass, so it is only
  computed when ``detailed_metrics=True`` (tests); bench runs lite.

At cluster scale the same layout maps 1:1 onto Iceberg table snapshots
(append ``parsed``/``metrics``, overwrite ``frontier``/``seen``).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from pubcrawler_spark.functions.urltools import with_canonical_url
from pubcrawler_spark.operators import cuckoo as cuckoo_mod
from pubcrawler_spark.operators import schedule as sched
from pubcrawler_spark.operators import seen as seen_mod
from pubcrawler_spark.operators.parse import parse_pages

STATE_TABLES = ("candidates", "sched", "parsed_links", "frontier", "seen", "metrics")


def _parquet_files(path: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    ]


def _count_parquet(path: str) -> int:
    """Row count from parquet footers — no Spark job."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in _parquet_files(path))


def _col_null_count(path: str, col: str, invert: bool = False) -> int:
    """Null count of a column from parquet row-group stats — no IO."""
    import pyarrow.parquet as pq

    total = 0
    for f in _parquet_files(path):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    total += c.statistics.null_count or 0
    return total


def _read_col(path: str, col: str, mask_col: str | None = None, mask_value=None) -> np.ndarray:
    """Read one column from a parquet dir driver-side (pyarrow; no Spark
    job). Used for small per-iteration deltas — the distributed twin for
    huge deltas is seen.build_bloom_shards + OR-merge."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    arrays = []
    for f in _parquet_files(path):
        cols = [col] + ([mask_col] if mask_col else [])
        t = pq.read_table(f, columns=cols)
        a = t.column(col)
        if mask_col is not None:
            a = pc.filter(a, pc.equal(t.column(mask_col), mask_value))
        arrays.append(a.to_numpy(zero_copy_only=False))
    if not arrays:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(arrays)


def _col_sum_false(path: str, col: str) -> int:
    """Count of False in a boolean column (reads only that column)."""
    import pyarrow.parquet as pq

    total = 0
    for f in _parquet_files(path):
        t = pq.read_table(f, columns=[col])
        # sum() of an EMPTY column is null — empty part files are normal
        # without AQE's runtime partition coalescing
        n_true = t.column(col).combine_chunks().sum().as_py() or 0
        total += t.num_rows - n_true
    return int(total)


def _write_seen_delta_pyarrow(
    path: str,
    fetched: tuple[np.ndarray, np.ndarray],
    disallowed: tuple[np.ndarray, np.ndarray],
) -> None:
    """Small-delta seen write, driver-side (no Spark job): concat the
    fetched and robots-disallowed (url_hash, url_canon) columns, dedup
    by hash, write one parquet file matching seen_mod.SEEN_SCHEMA. The
    two sources are disjoint by construction (disallowed rows are never
    scheduled), so the dedup only collapses within-source repeats."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    hashes = np.concatenate([fetched[0], disallowed[0]]).astype(np.int64)
    canons = np.concatenate([fetched[1], disallowed[1]])
    _, idx = np.unique(hashes, return_index=True)
    os.makedirs(path, exist_ok=True)
    tbl = pa.table(
        {
            "url_hash": pa.array(hashes[idx], pa.int64()),
            "url_canon": pa.array(canons[idx].astype(object), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(path, "part-00000-seen.parquet"))


def _write_metrics_pyarrow(path: str, k: int, scheduled: int, parsed: int, skipped_robots: int) -> None:
    """Lite-mode metrics row written driver-side (no Spark job)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    tbl = pa.table(
        {
            "iteration": pa.array([k], pa.int32()),
            "partition_id": pa.array([-1], pa.int32()),
            "scheduled": pa.array([scheduled], pa.int64()),
            "parsed": pa.array([parsed], pa.int64()),
            "skipped_robots": pa.array([skipped_robots], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(path, "part-00000-metrics.parquet"))


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
        bloom_impl: str = "driver",
        bloom_delta_driver_limit: int = 2_000_000,
        fetch_broadcast_limit: int = 4_000_000,
        seq_serial_limit: int = 2_000_000,
        salt_rows: int = 50_000,
        detailed_metrics: bool = True,
        expected_urls: int = 2_000_000,
        iteration_window_ms: int = 60_000,
        max_retries: int = 2,
    ) -> None:
        """``seen_mode``: ``"exact"`` (anti-join), ``"bloom"`` (no false
        negatives, no deletes), or ``"cuckoo"`` (same probe surface plus
        DELETION — :meth:`mark_unseen` re-admits URLs for re-crawl,
        which bloom cannot express; Fan et al. CoNEXT'14).

        ``bloom_impl`` picks the seen-set machinery in bloom mode:

        - ``"driver"`` — blobs live in driver memory (BloomShards),
          probe broadcasts them; per-iteration deltas are pulled with
          pyarrow while they stay under ``bloom_delta_driver_limit``
          rows, else built distributed (build_bloom_delta_shards) and
          OR-merged as blob rows. Right while blobs fit the driver.
        - ``"table"`` — the 10^10-URL path: blobs live ONLY as a
          checkpointed state table. Probe = shard-join cogroup, update
          = distributed OR-merge (update_bloom_shards); the driver
          never materializes a hash or a blob.
        """
        self.spark = spark
        self.year = year
        self.host_budget = host_budget
        self.seen_mode = seen_mode
        self.n_bloom_shards = n_bloom_shards
        self.bloom_impl = bloom_impl
        self.bloom_delta_driver_limit = bloom_delta_driver_limit
        self.fetch_broadcast_limit = fetch_broadcast_limit
        self.seq_serial_limit = seq_serial_limit
        self._bloom_geom = seen_mod._bloom_params(
            max(1, expected_urls // n_bloom_shards), 0.01
        )
        self._bloom_table: DataFrame | None = None
        self._cuckoo: "cuckoo_mod.CuckooShards | None" = None
        # last committed iteration the in-memory driver-held filter
        # (cuckoo/bloom shards) reflects; lets resume keep live state —
        # including mark_unseen deletes — instead of re-reading shards
        self._filter_state_k: int | None = None
        self._probabilistic = seen_mode in ("bloom", "cuckoo")
        self._seen_total = 0  # cumulative ledger size in bloom/cuckoo mode
        self.salt_rows = salt_rows
        self.detailed_metrics = detailed_metrics
        self.max_retries = max_retries
        self.expected_urls = expected_urls
        self.ckpt = checkpoint_dir
        self.seeds = seeds
        self._shards: seen_mod.BloomShards | None = None
        self.robots_rules = sched.parse_robots_rules(robots).cache()
        # one-time detection on the tiny cached dim: does any host need
        # the RFC 9309 longest-match evaluator (Allow rules / wildcards)?
        self._robots_advanced = bool(
            self.robots_rules.filter("has_advanced").head(1)
        )
        # one-time size gate for the per-iteration robots join: the
        # count materializes the cache it already pays for, and past
        # HOST_SIDE_BROADCAST_LIMIT hosts (real-web robots cardinality
        # ~10^8) the rules dim stays a distributed shuffle join instead
        # of a driver-melting broadcast.
        self._robots_small = (
            self.robots_rules.count() <= sched.HOST_SIDE_BROADCAST_LIMIT
        )
        # robots Crawl-delay → per-host slot budgets (tiny dim, cached)
        self.host_budgets = sched.host_budgets_from_robots(
            self.robots_rules, host_budget, iteration_window_ms
        ).cache()
        # fetch-side corpus: canonical url is the join key (J5). At real
        # scale `pages` is the Iceberg corpus partitioned by
        # bucket(url_hash); the schedule side broadcasts, so this table
        # is scanned in place and never shuffled.
        self.pages = with_canonical_url(pages).select("url", "url_canon", "html").cache()

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

    def _read(self, k: int, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._iter_dir(k), name))

    # -- iteration -----------------------------------------------------------

    def _initial_frontier(self) -> DataFrame:
        rows = [(u, 1.0, 0, i, 0) for i, u in enumerate(self.seeds)]
        df = self.spark.createDataFrame(
            rows, "url string, priority double, depth int, seq long, attempts int"
        )
        return with_canonical_url(df).select(*_frontier_cols())

    def run(self, max_iterations: int, resume: bool = False) -> dict:
        """Run the loop. While iterating, AQE is turned OFF (and
        restored on exit): the loop's plans are static — shuffle
        partition counts are preset, the one known skew (hot hosts) is
        handled explicitly by window salting, and every join strategy is
        size-gated from parquet footers — so adaptive re-planning buys
        nothing while its per-stage materialize-and-replan barrier costs
        ~10% of steady-iteration wall at bench sizes (measured at both
        local[2] and local[8]). Analytics queries on the same session
        keep AQE (skew-join splitting matters there)."""
        conf = self.spark.conf
        aqe_before = conf.get("spark.sql.adaptive.enabled", "true")
        # experiment escape hatch (BENCH/loop_matrix.py): keep AQE on
        # in-loop to re-measure its cost/benefit per core count
        if os.environ.get("SPARK_GRAFT_LOOP_AQE") != "keep":
            conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return self._run_loop(max_iterations, resume)
        finally:
            conf.set("spark.sql.adaptive.enabled", aqe_before)

    def _run_loop(self, max_iterations: int, resume: bool) -> dict:
        done = self.committed_iterations()
        if resume and done:
            start = done[-1] + 1
            frontier = self._read(done[-1], "frontier")
            seen = self._read(done[-1], "seen")
            if self._probabilistic:
                # bloom/cuckoo seen dirs are per-iteration deltas (append ledger)
                self._seen_total = sum(
                    _count_parquet(os.path.join(self._iter_dir(k), "seen")) for k in done
                )
            if self.seen_mode == "cuckoo":
                shard_dir = os.path.join(self._iter_dir(done[-1]), "cuckoo_shards")
                if self._cuckoo is not None and self._filter_state_k == done[-1]:
                    # the in-memory filter already reflects this
                    # checkpoint PLUS any mark_unseen deletes applied
                    # since — re-reading the shards would silently undo
                    # the re-crawl hook
                    pass
                elif os.path.isdir(shard_dir):
                    self._cuckoo = cuckoo_mod.CuckooShards.read(shard_dir)
                else:  # legacy checkpoint: rebuild from the seen ledger
                    self._cuckoo = cuckoo_mod.CuckooShards.sized(
                        self.expected_urls, n_shards=self.n_bloom_shards
                    )
                    self._cuckoo.add_hashes(
                        np.concatenate(
                            [
                                _read_col(os.path.join(self._iter_dir(k), "seen"), "url_hash")
                                for k in done
                            ]
                        ).astype(np.int64)
                    )
                self._filter_state_k = done[-1]
            elif self.seen_mode == "bloom":
                shard_dir = os.path.join(self._iter_dir(done[-1]), "seen_shards")
                if self.bloom_impl == "table":
                    if os.path.isdir(shard_dir):
                        self._bloom_table = self.spark.read.parquet(shard_dir)
                    else:  # legacy checkpoint: rebuild distributed from the ledger
                        self._bloom_table = seen_mod.build_bloom_delta_shards(
                            self._read_all("seen"), self.n_bloom_shards, *self._bloom_geom
                        )
                elif self._shards is not None and self._filter_state_k == done[-1]:
                    pass  # in-memory blobs already reflect this checkpoint
                elif os.path.isdir(shard_dir):
                    self._shards = seen_mod.BloomShards.read(shard_dir)
                else:  # legacy checkpoint: rebuild from the seen ledger
                    self._shards = seen_mod.BloomShards.sized(
                        self.expected_urls, n_shards=self.n_bloom_shards
                    )
                    self._shards.add_hashes(
                        np.concatenate(
                            [
                                _read_col(os.path.join(self._iter_dir(k), "seen"), "url_hash")
                                for k in done
                            ]
                        ).astype(np.int64)
                    )
                if self.bloom_impl != "table":
                    self._filter_state_k = done[-1]
        else:
            if os.path.exists(self.ckpt):
                shutil.rmtree(self.ckpt)
            os.makedirs(self.ckpt, exist_ok=True)
            start = 0
            frontier = self._initial_frontier()
            seen = self.spark.createDataFrame([], seen_mod.SEEN_SCHEMA)
            self._seen_total = 0
            self._filter_state_k = None
            if self.seen_mode == "cuckoo":
                self._cuckoo = cuckoo_mod.CuckooShards.sized(
                    self.expected_urls, n_shards=self.n_bloom_shards
                )
            elif self.seen_mode == "bloom":
                self._bloom_table = None  # empty until the first update
                if self.bloom_impl != "table":
                    self._shards = seen_mod.BloomShards.sized(
                        self.expected_urls, n_shards=self.n_bloom_shards
                    )

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
        tmp = self._iter_dir(k) + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)

        job_ms: dict[str, int] = {}

        def _write(df: DataFrame, name: str) -> str:
            t0 = time.monotonic()
            path = os.path.join(tmp, name)
            df.write.mode("overwrite").parquet(path)
            job_ms[name] = int((time.monotonic() - t0) * 1000)
            return path

        def _rb(name: str) -> DataFrame:
            return self.spark.read.parquet(os.path.join(tmp, name))

        cand = sched.dedup_candidates(frontier)
        if self.seen_mode == "cuckoo":
            unseen = self._cuckoo.filter_unseen(cand) if self._cuckoo.shards else cand
        elif self.seen_mode == "bloom":
            # incremental shards: probe only (empty filter passes all)
            if self.bloom_impl == "table":
                unseen = (
                    seen_mod.filter_unseen_bloom(
                        cand, self._bloom_table, self.n_bloom_shards, mode="shard_join"
                    )
                    if self._bloom_table is not None
                    else cand
                )
            else:
                unseen = (
                    self._shards.filter_unseen(cand) if self._shards.blobs else cand
                )
        else:
            unseen = seen_mod.filter_unseen_exact(cand, seen)

        # JOB 1: deduped+unseen candidates tagged with robots_ok —
        # materialized ONCE; the schedule ranks, leftovers, robots
        # metrics and the seen update are all projections of this table.
        cand_path = _write(
            sched.tag_robots(
                unseen,
                self.robots_rules,
                advanced=self._robots_advanced,
                small_dim=self._robots_small,
            ),
            "candidates",
        )
        cand_rb = _rb("candidates")
        t0 = time.monotonic()
        n_cand = _count_parquet(cand_path)
        job_ms["cand_counters"] = int((time.monotonic() - t0) * 1000)
        allowed_rb = cand_rb.filter(F.col("robots_ok")).drop("robots_ok")

        # JOB 2: SLIM schedule ranks (url_canon, sched_seq) — the salted
        # windows read the materialized candidates from disk and write a
        # few bytes per scheduled URL. Compared to pinning the full
        # schedule with an eager localCheckpoint (the r3 design), the
        # materialized slim table (a) costs a ~50× smaller write, (b)
        # broadcast-gates every downstream consumption (fetch keys,
        # column join-back, leftover anti-join), and (c) is committed
        # checkpoint state, so a resumed run can re-derive exactly what
        # iteration K scheduled without recomputing windows.
        ranks = sched.schedule_ranks(
            allowed_rb, self.host_budget,
            salt_rows=self.salt_rows, host_budgets=self.host_budgets,
            size_hint=n_cand,  # footer count: upper bound on schedule rows
            serial_limit=self.seq_serial_limit,
        )
        sched_path = _write(ranks, "sched")
        t0 = time.monotonic()
        n_sched = _count_parquet(sched_path)
        job_ms["sched_counter"] = int((time.monotonic() - t0) * 1000)
        if n_sched == 0:
            shutil.rmtree(tmp)
            return None
        sched_rb = _rb("sched")
        small_sched = n_sched <= self.fetch_broadcast_limit
        ranks_join = F.broadcast(sched_rb) if small_sched else sched_rb
        schedule = cand_rb.join(ranks_join, "url_canon").select(
            F.lit(k).alias("iteration"),
            F.col("sched_seq").alias("seq"),
            "url", "url_canon", "url_hash", "host", "priority", "depth",
            F.col("seq").alias("disc_seq"),
            "attempts",
        )

        # JOB 3: fetch join → parse, one pass. Fetch-join strategy,
        # size-gated on the EXACT schedule size (known from the slim
        # table's footers): under fetch_broadcast_limit, broadcast ONLY
        # the schedule's url_canon keys as a semi-join filter into the
        # cached corpus (keys are a few bytes/URL — a full-schedule
        # broadcast builds a large hash relation serially on the
        # driver); past the limit the keys exceed broadcast, so it
        # becomes a distributed shuffle semi-join (at Iceberg scale both
        # sides are bucketed by url_canon, so this is a
        # storage-partitioned join with no pages shuffle). Either way
        # the schedule columns are re-attached with a distributed join
        # and the written table carries them — `schedule` and `parsed`
        # are projections.
        fetch_keys = sched_rb.select("url_canon")
        if small_sched:
            fetch_keys = F.broadcast(fetch_keys)
        hit_pages = self.pages.select("url_canon", "html").join(
            fetch_keys, "url_canon", "left_semi"
        )
        parsed_pages = parse_pages(hit_pages, self.year, url_col="url_canon").select(
            "url_canon", "parsed"
        )
        parsed_full = schedule.join(parsed_pages, "url_canon", "left").withColumn(
            "fetched", F.col("parsed").isNotNull()
        )
        pl_projected = parsed_full.select(
            "iteration", "seq", "url_canon", "url_hash", "host",
            "priority", "depth", "disc_seq", "attempts", "url", "fetched",
            F.col("parsed.id").alias("id"),
            F.col("parsed.title").alias("title"),
            F.col("parsed.authors").alias("authors"),
            F.col("parsed.abstract").alias("abstract"),
            F.col("parsed.pdf_url").alias("pdf_url"),
            F.col("parsed.source_url").alias("source_url"),
            F.col("parsed.text").alias("text"),
            F.col("parsed.links").alias("links"),
        )
        pl_path = _write(pl_projected, "parsed_links")
        t0 = time.monotonic()
        pl_rb = _rb("parsed_links")
        n_parsed = n_sched - _col_null_count(pl_path, "id")
        job_ms["pl_counters"] = int((time.monotonic() - t0) * 1000)

        # JOB 3: next frontier = budget-deferred leftovers ∪ new links
        # ∪ fetch-miss retries (X3: decayed priority, bounded attempts).
        # Child discovery seq = parent GLOBAL schedule seq × 100k + link
        # position: bounded (global seq resets each iteration, unlike the
        # raw discovery seq whose product chain overflows int64 at depth
        # ≥3) and semantically the submission order of the parent.
        links = pl_rb.select(
            "priority", "depth", "seq",
            F.posexplode_outer("links").alias("pos", "url"),
        ).filter(F.col("url").isNotNull())
        new_frontier = with_canonical_url(
            links.select(
                "url",
                (F.col("priority") * 0.5).alias("priority"),
                (F.col("depth") + 1).alias("depth"),
                (F.col("seq") * 100_000 + F.col("pos")).alias("seq"),
                F.lit(0).alias("attempts"),
            )
        ).select(*_frontier_cols())
        # leftovers = allowed candidates not scheduled this iteration;
        # the slim ranks broadcast, so this anti-join is a broadcast
        # probe of the candidates scan, not a shuffle (the r3 engine
        # shuffle-anti-joined against the full parsed_links table here)
        leftover = allowed_rb.join(
            F.broadcast(sched_rb.select("url_canon")) if small_sched
            else sched_rb.select("url_canon"),
            "url_canon", "left_anti",
        ).select(*_frontier_cols())
        retries = (
            pl_rb.filter(~F.col("fetched") & (F.col("attempts") < self.max_retries))
            .select(
                "url", "url_canon", "url_hash", "host",
                (F.col("priority") * 0.25).alias("priority"),
                "depth",
                F.col("disc_seq").alias("seq"),
                (F.col("attempts") + 1).alias("attempts"),
            )
            .select(*_frontier_cols())
        )
        # the frontier write is a pure function of tables already on
        # disk, and everything between here and the commit (seen delta,
        # footer counters, bloom shard update, metrics) reads those same
        # committed-to-tmp files — not the frontier output. Submit the
        # write from a thread so the driver-side tail work back-fills
        # the Spark job's wall time instead of serializing after it
        # (guide-style job overlap; job descriptions are thread-local).
        frontier_df = leftover.unionByName(new_frontier).unionByName(retries)
        frontier_box: dict = {}

        def _write_frontier() -> None:
            try:
                frontier_box["path"] = _write(frontier_df, "frontier")
            except BaseException as exc:  # re-raised on join
                frontier_box["exc"] = exc

        from pyspark import InheritableThread

        frontier_th = InheritableThread(target=_write_frontier)
        frontier_th.start()

        t0 = time.monotonic()
        n_disallowed = _col_sum_false(cand_path, "robots_ok")
        job_ms["cand_counters"] += int((time.monotonic() - t0) * 1000)

        # JOB 4: seen update = successfully fetched ∪ robots-disallowed
        # (fetch misses stay un-seen so retries pass the seen filter;
        # bloom shards have no deletes, so this ordering is load-bearing).
        # Bloom mode writes ONLY the delta — the seen table is an
        # APPEND-ONLY ledger across iterations (Iceberg append), so the
        # per-iteration cost is O(delta), not O(total): rewriting the
        # full seen set every iteration is the rewrite-the-world
        # anti-pattern at a 10^10-URL frontier. Exact mode keeps the
        # full rewrite (its anti-join probe needs one consolidated
        # table and it exists for fixture-scale determinism anyway).
        # Delta-size gate for the WRITE itself: when this iteration's
        # delta is bounded (n_sched + n_disallowed from footers — both
        # known without an action), the delta is assembled driver-side
        # with pyarrow from the two parquet tables just written (one
        # masked column read each, numpy dedup, one file write) — no
        # Spark job at all. Past the limit, the distributed plan runs.
        # This is the same driver-vs-distributed gating the bloom update
        # below already uses, applied one step earlier. Never in
        # bloom_impl="table" — that mode's contract is that the driver
        # materializes NO hashes, ever (tested by poisoning _read_col).
        delta_bound = n_sched + n_disallowed
        driver_delta_ok = self._probabilistic and not (
            self.seen_mode == "bloom" and self.bloom_impl == "table"
        )
        if driver_delta_ok and delta_bound <= self.bloom_delta_driver_limit:
            seen_path = os.path.join(tmp, "seen")
            t0 = time.monotonic()
            _write_seen_delta_pyarrow(
                seen_path,
                fetched=(
                    _read_col(pl_path, "url_hash", "fetched", True),
                    _read_col(pl_path, "url_canon", "fetched", True),
                ),
                disallowed=(
                    _read_col(cand_path, "url_hash", "robots_ok", False),
                    _read_col(cand_path, "url_canon", "robots_ok", False),
                ),
            )
            job_ms["seen"] = int((time.monotonic() - t0) * 1000)
        else:
            delta_seen = (
                pl_rb.filter(F.col("fetched")).select("url_hash", "url_canon")
                .unionByName(cand_rb.filter(~F.col("robots_ok")).select("url_hash", "url_canon"))
                .dropDuplicates(["url_hash"])
            )
            if self._probabilistic:
                seen_path = _write(delta_seen, "seen")
            else:
                seen_path = _write(
                    delta_seen.unionByName(seen).dropDuplicates(["url_hash"]), "seen"
                )
        t0 = time.monotonic()
        n_fetch_miss = _col_sum_false(pl_path, "fetched")
        job_ms["miss_counter"] = int((time.monotonic() - t0) * 1000)
        # The in-memory seen filter is about to be mutated (cuckoo/bloom
        # add_hashes) BEFORE the commit rename below; mark it dirty
        # immediately before the first mutation — not at iteration
        # start — so a failure during the fetch/parse phase (filter
        # untouched) keeps the filter valid and preserves any
        # mark_unseen re-crawl intent, while a failure between here and
        # the commit still forces resume() to re-read the committed
        # shards instead of keeping a filter contaminated with this
        # iteration's (never-committed) url_hashes — in bloom mode those
        # URLs would otherwise be silently un-crawlable forever (bloom
        # cannot delete). Restored to k only after the atomic commit.
        self._filter_state_k = None
        if self.seen_mode == "cuckoo":
            # cuckoo shards: driver-held tables, delete-capable (the
            # re-crawl path bloom cannot express); delta from the ledger
            self._cuckoo.add_hashes(_read_col(seen_path, "url_hash").astype(np.int64))
            self._cuckoo.write(os.path.join(tmp, "cuckoo_shards"))
        elif self.seen_mode == "bloom":
            # the just-written seen table IS this iteration's delta
            # (append-only ledger), so every update path reads it
            # directly — no second pass over parsed/candidates
            n_delta = _count_parquet(seen_path)
            if self.bloom_impl == "table":
                # distributed OR-merge: delta hashes cogroup with the
                # existing blob rows; driver touches neither
                base = self._bloom_table
                if base is None:
                    base = self.spark.createDataFrame([], seen_mod.BLOOM_SCHEMA)
                _write(
                    seen_mod.update_bloom_shards(
                        _rb("seen").select("url_hash"), base,
                        self.n_bloom_shards, *self._bloom_geom,
                    ),
                    "seen_shards",
                )
            elif n_delta > self.bloom_delta_driver_limit:
                # big delta: build fixed-geometry delta blobs distributed
                # and OR-merge the (bounded-size) blob rows — the driver
                # never pulls raw hashes
                self._shards.add_blob_rows(
                    seen_mod.build_bloom_delta_shards(
                        _rb("seen"), self.n_bloom_shards,
                        self._shards.n_bits, self._shards.n_hashes,
                    ).collect()
                )
                self._shards.write(os.path.join(tmp, "seen_shards"))
            else:
                # small delta: pyarrow column read + numpy OR (no job)
                self._shards.add_hashes(
                    _read_col(seen_path, "url_hash").astype(np.int64)
                )
                self._shards.write(os.path.join(tmp, "seen_shards"))

        frontier_th.join()
        if "exc" in frontier_box:
            raise frontier_box["exc"]
        frontier_path = frontier_box["path"]

        t_commit = time.monotonic()
        counts = {
            "iteration": k,
            "input_rows": n_cand,
            "scheduled": n_sched,
            "parsed": n_parsed,
            "skipped_robots": n_disallowed,
            "fetch_misses": n_fetch_miss,
            "frontier_next": _count_parquet(frontier_path),
        }
        if self._probabilistic:
            self._seen_total += _count_parquet(seen_path)
            counts["seen_total"] = self._seen_total
        else:
            counts["seen_total"] = _count_parquet(seen_path)

        # metrics: lite mode writes the counters with pyarrow (no Spark
        # job); detailed mode adds per-partition lineage (JOB 5)
        if self.detailed_metrics:
            metrics = (
                pl_rb.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(
                    F.count("*").alias("scheduled"),
                    F.count("id").alias("parsed"),
                )
                .withColumn("iteration", F.lit(k))
                .withColumn("skipped_robots", F.lit(n_disallowed))
            )
            _write(metrics, "metrics")
        else:
            _write_metrics_pyarrow(
                os.path.join(tmp, "metrics"), k, n_sched, n_parsed, n_disallowed
            )

        job_ms["commit_tail"] = int((time.monotonic() - t_commit) * 1000)
        counts["job_ms"] = job_ms
        manifest = {
            "iteration": k,
            "counts": counts,
            "lineage": {
                name: sorted(
                    f for f in os.listdir(os.path.join(tmp, name)) if f.startswith("part-")
                )
                for name in os.listdir(tmp)
                if os.path.isdir(os.path.join(tmp, name))
            },
        }
        with open(os.path.join(tmp, "_manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=1)
        final = self._iter_dir(k)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)  # atomic commit
        self._filter_state_k = k  # in-memory filter now matches iter=k

        # read back committed state (cuts lineage like Iceberg snapshot reads)
        if self.seen_mode == "bloom" and self.bloom_impl == "table":
            self._bloom_table = self._read(k, "seen_shards")
        return self._read(k, "frontier"), self._read(k, "seen"), counts

    def mark_unseen(self, url_hashes) -> int:
        """Cuckoo-only re-crawl hook: delete the given url_hashes from
        the seen filter so a future discovery re-schedules them (stale-
        page refresh). Returns how many were actually removed. The next
        committed iteration checkpoints the updated shards."""
        if self.seen_mode != "cuckoo" or self._cuckoo is None:
            raise ValueError("mark_unseen requires seen_mode='cuckoo'")
        # note: the seen LEDGER keeps the URL (it is crawl history);
        # only the filter — which governs scheduling — forgets it
        return self._cuckoo.delete_hashes(np.asarray(url_hashes, dtype=np.int64))

    # -- readers over the full run --------------------------------------------
    # `parsed_links` carries the schedule columns (written once per
    # iteration); `schedule` and `parsed` are column-pruned projections.

    def _read_all(self, name: str) -> DataFrame:
        dirs = [os.path.join(self._iter_dir(k), name) for k in self.committed_iterations()]
        return self.spark.read.parquet(*dirs)

    def full_schedule(self) -> DataFrame:
        return self._read_all("parsed_links").select(
            "iteration", "seq", "url_canon", "url_hash", "host",
            "priority", "depth", "attempts", "fetched",
        )

    def full_parsed(self) -> DataFrame:
        return self._read_all("parsed_links").filter(F.col("id").isNotNull()).select(
            "url_canon", "id", "title", "authors", "abstract",
            "pdf_url", "source_url", "text", "iteration",
        )

    def full_metrics(self) -> DataFrame:
        return self._read_all("metrics")

    def final_seen(self) -> DataFrame:
        if self._probabilistic:
            # the seen table is an append-only delta ledger in bloom/cuckoo mode
            return self._read_all("seen").dropDuplicates(["url_hash"])
        k = self.committed_iterations()[-1]
        return self._read(k, "seen")


def _frontier_cols():
    return ("url", "url_canon", "url_hash", "host", "priority", "depth", "seq", "attempts")
