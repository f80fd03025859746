"""The BSP crawl engine — every crawl round is one incremental DataFrame job.

Reference semantics re-expressed data-parallel (SURVEY.md §3.1): the
6-thread lock-serialized dequeue loop (WebCrawler.java:145-202) becomes,
per logical tick ``t``:

    sub-step (repeat until no URL is eligible at t — expansions admitted
    during t are immediately eligible, matching the serialization):
      1. eligibility  : frontier ⋈ host_state (broadcast) — politeness F8
      2. per-IP pick  : row_number over (partition by ip order by seq) = 1
                        — the FIFO-with-skip dequeue W1; one host maps to
                        one IP so this also enforces the per-host budget
      3. reservation  : next_allowed[host]=next_allowed[ip]=t+delay (J3)
      4. fetch        : picks ⋈ webgraph (replaces live HTTP, S2) —
                        broadcast while picks are broadcast-sized, shuffle
                        hash join beyond that (AQE re-plans at runtime)
      5. redirect     : bounded iterative chase with cycle guard (J8)
      6. classify     : missing→404 / binary→BINARY (S3) / dup→DUPLICATE
                        via content_map join + first-writer window (J5/W2)
      7. expand       : href+onclick extraction (X3/X4, pure Catalyst) →
                        admission filters F1-F7+F9 (cheap native filters
                        first) → batch dedup → anti-join seen (J2) →
                        dense seq assignment (distributed two-phase)
      8. buffer       : trace/links/images/pages deltas, seen, frontier

State layout is append-only deltas (Iceberg-ready; parquet fallback per
SURVEY §7 step 3): ``trace``, ``links``, ``images``, ``content_map``,
``page_admissions``, ``page_visits``, ``consumed``, ``seen`` are buffered
per sub-step and committed once per round (``checkpoint_every`` rounds);
``frontier`` is *derived* — admissions LEFT ANTI (visits ∪ consumed) — so
resume from any committed round needs no mutable table. ``host_state``
(tiny) is snapshotted whole at each commit; the manifest records the
resume cursor (last round, next seq). ``CrawlEngine(..., resume=True)``
rebuilds all state from the store and continues — the north_rule
checkpoint/resume contract.

Scale notes (the 1000-executor story):
* frontier/seen joins hash-partition on url; the hot-host skew head never
  concentrates a join because eligibility+pick bound per-host work to one
  URL per round *by construction* (the politeness budget is the skew cap).
* picks per sub-step ≤ #IPs; broadcast into the webgraph fetch join only
  under ``broadcast_pick_limit``, else a plain equi-join (AQE skew-safe).
* sequence assignment avoids a single-partition window: range-partition by
  (parent_seq, pos), count per partition (JVM-only), prefix-sum offsets on
  the driver (#partitions values), then a per-partition window.
* per-round metrics record per-partition row counts for every delta table
  (lineage per north_rule) — computed at commit time in one job.
* driver-side job count is the single-node bottleneck at fixture scale:
  deltas are buffered (one write per table per round, not per sub-step)
  and state checkpoints are lazy (merged into the next action) — at
  cluster scale the same structure amortizes over millions of rows per
  sub-step.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webcrawler_spark.functions.mime import data_type_code, image_mime
from webcrawler_spark.functions.urls import (
    canonicalize_url,
    in_containment,
    is_binary_extension,
    is_rejected_scheme,
    url_host,
)
from webcrawler_spark.storage.snapshots import SnapshotStore

TICK_MS = 5000
MAX_REDIRECT_DEPTH = 3

DELTA_TABLES = (
    "trace", "page_visits", "consumed", "links", "images",
    "image_captions", "content_map", "page_admissions", "seen", "page_data",
    "evictions", "site",
)


@dataclass
class CrawlConfig:
    seed_domains: tuple[str, ...] = ("gov.si",)
    tick_ms: int = TICK_MS
    max_pages: int | None = None
    max_rounds: int = 10_000
    store_root: str = "/tmp/crawl_store"
    checkpoint_every: int = 1      # rounds between store commits
    collect_metrics: bool = True   # per-partition lineage rows at commit
    broadcast_pick_limit: int = 100_000  # picks under this → broadcast fetch join
    state_partitions: int = 8      # partition cap for incrementally-unioned state
                                   # (scale: ≈ cluster cores; prevents the
                                   # union-per-substep partition blowup)
    use_bloom_prefilter: bool = False  # F5 Bloom sidecar over the seen set
                                   # (north_rule): rebuilt at each state
                                   # truncation; within-round seen growth is
                                   # covered by a small exact delta check, so
                                   # results are identical (tested). Pays off
                                   # when candidate batches are large; at
                                   # tiny fixture scale the Arrow round-trip
                                   # per sub-step outweighs the join savings,
                                   # hence default off
    seen_filter: str = "bloom"     # sidecar layout when use_bloom_prefilter:
                                   # "bloom" (ShardedBloomSidecar) or
                                   # "cuckoo" (ShardedCuckooSidecar — same
                                   # probe contract, supports eviction;
                                   # see functions/cuckoo.py)
    eager_state_threshold: int = 0  # sub-steps picking >= this many URLs
                                   # truncate state immediately. seen/
                                   # visited/content_map are SELF-REFERENTIAL
                                   # (delta k derives from state k-1), so lazy
                                   # chaining doubles the plan per sub-step —
                                   # 0 (always truncate) is the only safe
                                   # default; raising it is an experiment knob
    debug_timing: bool = False     # print per-action wall times


@dataclass
class CrawlStats:
    rounds: int = 0
    substeps: int = 0
    visited: int = 0
    stored: int = 0
    per_round: list = field(default_factory=list)


def _path_expr(url):
    """Path component of a canonical URL ('' host-root → '/')."""
    p = F.regexp_replace(url, r"^[a-z]+://[^/]*", "")
    return F.when(p == "", "/").otherwise(p)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        webgraph: DataFrame,
        robots: DataFrame,
        seeds: list[str],
        config: CrawlConfig | None = None,
        resume: bool = False,
    ):
        self.spark = spark
        self.cfg = config or CrawlConfig()
        self.store = SnapshotStore(spark, self.cfg.store_root)
        self.stats = CrawlStats()
        self._buf: dict[str, list[DataFrame]] = {t: [] for t in DELTA_TABLES}
        self._live_caches: list[DataFrame] = []
        self._round_visits: list[DataFrame] = []
        self._state_dirty = False
        self._sidecar = None  # F5 Bloom sidecar (rebuilt at state truncation)
        self._seen_new = spark.createDataFrame([], "url string")

        # webgraph: the synthetic web (REF-ONLY live HTTP replaced, S2).
        # Cached once; every fetch joins picks against it.
        self.wg = webgraph.persist()
        self.wg_redirects = (
            self.wg.select("url", "redirect_to")
            .filter(F.col("redirect_to").isNotNull())
            .persist()
        )
        # redirect *closure*, resolved once (static web): per redirect source,
        # the final landing URL, the canonicalized hop chain, and the
        # cycle/depth flag (J8). Per sub-step the chase is then a single
        # broadcast join instead of MAX_REDIRECT_DEPTH unrolled self-joins —
        # at 10^10 scale this is also the right plan: the closure is
        # O(#redirect sources), computed one time per webgraph snapshot.
        self.redirect_final = self._resolve_redirects().persist()
        # host dims, all broadcast-sized: host→ip, host→delay, host→disallow
        self.host_ip = self.wg.select("host", "ip").distinct().persist()
        if "body" in robots.columns:
            # S4: parse raw robots.txt bodies with the vectorized parser
            # (one pass over the tiny host dimension, then broadcast)
            from webcrawler_spark.functions.robots import make_parse_robots_udf

            robots = robots.select(
                "host", F.col("body").alias("robots_content"),
                make_parse_robots_udf()(F.col("body")).alias("r")
            ).select(
                "host", "robots_content",
                F.col("r.disallow_prefixes").alias("disallow_prefixes"),
                F.col("r.allow_prefixes").alias("allow_prefixes"),
                F.col("r.crawl_delay_s").alias("crawl_delay_s"),
                F.col("r.sitemaps").alias("sitemaps"),
                F.col("r.is_html_page").alias("is_html_page"),
            )
        if "allow_prefixes" not in robots.columns:
            robots = robots.withColumn("allow_prefixes", F.array().cast("array<string>"))
        if "robots_content" not in robots.columns:
            # structured-only fixture (no raw bytes) — site rows carry a
            # null robots_content, like a domain whose robots never fetched
            robots = robots.withColumn("robots_content", F.lit(None).cast("string"))
        if "sitemaps" not in robots.columns:
            robots = robots.withColumn("sitemaps", F.array().cast("array<string>"))
        live_robots = robots.filter(~F.col("is_html_page"))  # WebCrawler.java:108-112
        self.host_delay = (
            live_robots.select(
                "host",
                F.when(F.col("crawl_delay_s") > 0, F.col("crawl_delay_s") * 1000)
                .otherwise(F.lit(self.cfg.tick_ms))
                .alias("delay_ms"),  # zero-delay fallback, WebCrawler.java:178-179
            ).persist()
        )
        # hosts with no Disallow line are allow-all regardless of Allow
        # lines (longest-match needs a disallow hit to deny), so only
        # disallow-bearing hosts enter the broadcast dim
        self.host_rules = (
            live_robots.select("host", "disallow_prefixes", "allow_prefixes")
            .filter(F.size("disallow_prefixes") > 0)
            .persist()
        )
        # site dimension for the S6-analog `site` table: the reference
        # stores one row per crawled domain — (domain, robots_content,
        # sitemap_content) with sitemap_content = Arrays.toString(sitemaps)
        # on a successful raw robots fetch, nulls when robots is missing or
        # an HTML page (DatabaseHandler.java:21-47, WebCrawler.java:83-116).
        # Live-robots hosts carry content; every other dequeued host left-
        # joins to nulls at emission time.
        self.site_dim = (
            live_robots.select(
                F.col("host").alias("domain"),
                "robots_content",
                F.concat(
                    F.lit("["), F.array_join("sitemaps", ", "), F.lit("]")
                ).alias("sitemap_content"),
            ).persist()
        )

        if resume and self.store.get_meta("last_round") is not None:
            self._load_state()
            return

        # --- fresh state ---
        seeds_df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(seeds)], "seq long, url string"
        ).select("seq", canonicalize_url(F.col("url")).alias("url"))
        seeds_df = (
            seeds_df.withColumn("host", url_host(F.col("url")))
            .join(self.host_ip, "host", "left")
            .withColumn("ip", F.coalesce("ip", F.lit("0.0.0.0")))
            .select("seq", "url", "host", "ip")
        )
        self.frontier = seeds_df.localCheckpoint(eager=True)
        self.seen = seeds_df.select("url").localCheckpoint(eager=True)
        self.host_state = spark.createDataFrame(
            [], "kind string, key string, next_allowed long"
        )
        self.site_domains = spark.createDataFrame([], "domain string")
        self.content_map = spark.createDataFrame(
            [], "fp long, text string, url string, vseq long"
        )
        self.visited_pages = spark.createDataFrame(
            [], "url string, page_type_code string, status int, time_ms long, seq long"
        )
        self._seq_base = len(seeds)
        self._start_round = 0
        self._append("page_admissions", self.frontier.select("seq", "url", "host", "ip"))

    # ------------------------------------------------------------------
    # delta buffering + per-round commit (+ resume)
    # ------------------------------------------------------------------
    def _append(self, table: str, df: DataFrame) -> None:
        self._buf[table].append(df)

    def _ckpt(self, df: DataFrame, label: str) -> DataFrame:
        with self._t("ckpt:" + label):
            return df.localCheckpoint(eager=True)

    @contextmanager
    def _t(self, label: str):
        t0 = time.time()
        yield
        if self.cfg.debug_timing:
            print(f"      [{label}] {time.time()-t0:.2f}s", flush=True)

    def _commit(self, round_: int) -> None:
        """Write buffered deltas (one job per table), snapshot host_state,
        advance the manifest cursor. This IS the checkpoint."""
        metric_parts = []
        for table, frames in self._buf.items():
            if not frames:
                continue
            df = frames[0]
            for f_ in frames[1:]:
                df = df.unionByName(f_)
            path = f"{self.store.root}/{table}/delta_r{round_:06d}"
            df.coalesce(self.cfg.state_partitions).write.mode("overwrite").parquet(path)
            self._buf[table] = []
            if self.cfg.collect_metrics:
                metric_parts.append(
                    self.spark.read.parquet(path)
                    .groupBy(F.spark_partition_id().alias("partition_id"))
                    .count()
                    .select(
                        F.lit(round_).alias("round"),
                        F.lit(table).alias("table"),
                        "partition_id",
                        F.col("count").alias("rows"),
                    )
                )
        if metric_parts:
            m = metric_parts[0]
            for p in metric_parts[1:]:
                m = m.unionByName(p)
            m.write.mode("overwrite").parquet(
                f"{self.store.root}/metrics/delta_r{round_:06d}"
            )
        self.host_state.write.mode("overwrite").parquet(
            f"{self.store.root}/host_state/r{round_:06d}"
        )
        self.store.mark_round(round_)
        self.store.set_meta(last_round=round_, next_seq=self._seq_base)

    def _read_all(self, table: str) -> DataFrame | None:
        """Read a table's committed deltas — gated by the manifest cursor
        so orphan delta dirs from a crash mid-commit (written after the
        cursor last advanced) are never absorbed; a re-run round simply
        overwrites them. This is what makes the commit effectively atomic:
        the cursor advance (mark_round/set_meta, the LAST step of _commit)
        is the only thing that publishes a round's deltas."""
        last = self.store.get_meta("last_round")
        if last is None:
            return None
        paths = [
            p for p in sorted(glob.glob(f"{self.store.root}/{table}/delta_*"))
            if int(p.rsplit("delta_r", 1)[-1]) <= last
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def _load_state(self) -> None:
        """Rebuild all mutable state from the store (resume-from-checkpoint)."""
        last = self.store.get_meta("last_round")
        self._seq_base = self.store.get_meta("next_seq")
        self._start_round = last + 1
        adm = self._read_all("page_admissions")
        visits = self._read_all("page_visits")
        consumed = self._read_all("consumed")
        trace = self._read_all("trace")
        self.visited_pages = (visits or self.spark.createDataFrame(
            [], "url string, page_type_code string, status int, time_ms long, seq long"
        )).localCheckpoint(eager=True)
        # frontier = admissions minus PICKED urls (trace ∪ consumed) — NOT
        # minus visits: a URL visited via another pick's redirect landing
        # was never dequeued, and an uninterrupted run would still pick it
        # (emitting a trace row + politeness reservation before being
        # consumed-without-storing). Subtracting visits dropped such URLs
        # forever, so a resumed run could diverge from a clean one in
        # trace content and per-host timing.
        evictions = self._read_all("evictions")
        seen_extra = self._read_all("seen")
        if evictions is None:
            # append-only reconstruction — the battle-tested path, kept
            # byte-for-byte for every store without evictions
            gone = self.spark.createDataFrame([], "url string")
            if trace is not None:
                gone = gone.unionByName(trace.select("url"))
            if consumed is not None:
                gone = gone.unionByName(consumed.select("url"))
            self.frontier = adm.join(gone, "url", "left_anti").localCheckpoint(eager=True)
            seen = adm.select("url")
            if seen_extra is not None:
                seen = seen.unionByName(seen_extra.select("url")).distinct()
            self.seen = seen.localCheckpoint(eager=True)
        else:
            # evict_seen ran in this store's history: reconstruction must
            # be stamp/count-aware, because an evicted-then-relinked URL
            # has MULTIPLE admission rows and pick/trace rows.
            # Frontier: a URL is queued iff its admissions outnumber its
            # picks; every pick emits a trace row (consumed rows — picks
            # that stored no page — are a subset of traced picks), so
            # picks count from trace alone. The live row is the LATEST
            # admission (max seq). Degenerates to the plain anti-join for
            # urls admitted once.
            n_picked = (
                trace.groupBy("url").agg(F.count("*").alias("n_picked"))
                if trace is not None else None
            )
            na = adm.groupBy("url").agg(
                F.count("*").alias("n_adm"), F.max("seq").alias("seq"))
            if n_picked is not None:
                na = na.join(n_picked, "url", "left")
            else:
                na = na.withColumn("n_picked", F.lit(None).cast("long"))
            live = na.filter(
                F.coalesce(F.col("n_picked"), F.lit(0)) < F.col("n_adm")
            ).select("url", "seq")
            self.frontier = adm.join(
                live, ["url", "seq"], "left_semi").localCheckpoint(eager=True)
            self.seen = self._stored_seen(
                adm, seen_extra, evictions).localCheckpoint(eager=True)
            # visited_pages: a URL counts as visited iff some visit row
            # postdates its last eviction — in TIME space (round ticks),
            # because a visit row's per-row seq can belong to an old pick
            # (redirect landings carry the picker's seq; see evict_seen).
            # Rows of qualifying URLs are all kept; the set-membership
            # anti-join at :508 is the only in-memory consumer.
            if visits is not None:
                last_ev = evictions.groupBy("url").agg(
                    F.max("evict_time_ms").alias("evict_time_ms"))
                vkeep = (
                    visits.groupBy("url").agg(F.max("time_ms").alias("vt"))
                    .join(last_ev, "url", "left")
                    .filter(F.col("evict_time_ms").isNull()
                            | (F.col("vt") >= F.col("evict_time_ms")))
                    .select("url")
                )
                self.visited_pages = visits.join(
                    vkeep, "url", "left_semi").localCheckpoint(eager=True)
        cm = self._read_all("content_map")
        self.content_map = (cm if cm is not None else self.spark.createDataFrame(
            [], "fp long, text string, url string, vseq long"
        )).localCheckpoint(eager=True)
        hs = self.spark.read.parquet(f"{self.store.root}/host_state/r{last:06d}")
        self.host_state = hs.localCheckpoint(eager=True)
        # emitted-site-rows guard: one site row per domain for the life of
        # the store (the reference's getSiteId != -1 check), rebuilt from
        # the committed table
        st = self._read_all("site")
        self.site_domains = (
            st.select("domain").distinct()
            if st is not None
            else self.spark.createDataFrame([], "domain string")
        ).localCheckpoint(eager=True)
        # reopen the carried seen-set sidecar if a completed version is
        # recorded (its _META marker certifies completion). It was last
        # refreshed at a truncation AT OR AFTER the resume cursor, i.e. it
        # is a superset of the committed seen set — safe (false negatives
        # impossible; extras just route through the exact confirm join).
        # _seen_new stays empty for the same reason. Missing/incomplete →
        # sidecar stays None and the first truncation full-builds.
        if self.cfg.use_bloom_prefilter:
            sp = self.store.get_meta("sidecar_path")
            if sp:
                if self.cfg.seen_filter == "cuckoo":
                    from webcrawler_spark.functions.cuckoo import (
                        load_sharded_cuckoo as _load)
                else:
                    from webcrawler_spark.functions.bloom import (
                        load_sharded_bloom as _load)
                self._sidecar = _load(sp)
            if self._sidecar is not None:
                # validate resume-time: the reopened filter must contain
                # EVERY committed-seen URL (false negatives break dedup
                # outright; the superset argument above assumes the
                # prefilter was on for every intervening run — a run with
                # it off commits seen without advancing the pointer). One
                # Arrow-probe pass over seen, same cost as the build's
                # hash pass, only paid at resume. Any miss → discard and
                # let the first truncation full-build.
                n_fn = self.seen.filter(
                    ~self._sidecar.probe(F.col("url"))).count()
                if n_fn > 0:
                    self._sidecar = None

    # ------------------------------------------------------------------
    # one sub-step at logical time t; returns number of URLs fetched
    # ------------------------------------------------------------------
    def _substep(self, t: int) -> int:
        cfg = self.cfg

        # 1-2. eligibility + per-IP FIFO pick (F8 + W1)
        hs_d = self.host_state.filter(F.col("kind") == "d").select(
            F.col("key").alias("host"), F.col("next_allowed").alias("na_d")
        )
        hs_i = self.host_state.filter(F.col("kind") == "i").select(
            F.col("key").alias("ip"), F.col("next_allowed").alias("na_i")
        )
        elig = (
            self.frontier.join(F.broadcast(hs_d), "host", "left")
            .join(F.broadcast(hs_i), "ip", "left")
            .filter(
                (F.coalesce("na_d", F.lit(0)) <= t) & (F.coalesce("na_i", F.lit(0)) <= t)
            )
        )
        w = Window.partitionBy("ip").orderBy("seq")
        picks = (
            elig.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("seq", "url", "host", "ip")
            .persist()
        )
        with self._t('picks.count'):
            n_picked = picks.count()
        if n_picked == 0:
            picks.unpersist()
            return 0

        # 2b. site rows at first dequeue per domain (S6-analog of
        # DatabaseHandler.addSite/editSite, WebCrawler.java:77-124): the
        # reference lazily inserts (domain, robots_content, sitemap_content)
        # the first time a URL of that domain is dequeued — content from the
        # raw robots fetch, nulls when robots is missing/an HTML page. Both
        # sides of the anti-join are host-dimension-sized (broadcast).
        new_sites = (
            picks.select(F.col("host").alias("domain")).distinct()
            .join(F.broadcast(self.site_domains), "domain", "left_anti")
        )
        self._append(
            "site",
            new_sites.join(F.broadcast(self.site_dim), "domain", "left")
            .select("domain", "robots_content", "sitemap_content"),
        )
        self.site_domains = self.site_domains.unionByName(new_sites)

        # 3. politeness reservation at dequeue, both keys (WebCrawler.java:182-185)
        res = (
            picks.join(F.broadcast(self.host_delay), "host", "left")
            .withColumn("delay_ms", F.coalesce("delay_ms", F.lit(cfg.tick_ms)))
            .withColumn("next_allowed", F.lit(t) + F.col("delay_ms"))
        )
        new_state = res.select(
            F.lit("d").alias("kind"), F.col("host").alias("key"), "next_allowed"
        ).unionByName(
            res.select(F.lit("i").alias("kind"), F.col("ip").alias("key"), "next_allowed")
        ).groupBy("kind", "key").agg(F.max("next_allowed").alias("next_allowed"))
        keys = new_state.select("kind", "key")
        self.host_state = (
            self.host_state.join(F.broadcast(keys), ["kind", "key"], "left_anti")
            .unionByName(new_state)
        )

        # trace records the *picked* URL, pre-redirect (logs1 format, S11)
        self._append("trace", picks.select(F.lit(t).alias("time_ms"), "seq", "url", "host"))

        # 4+5. fetch + redirect chase (S2/J8): one broadcast join against the
        # precomputed redirect closure; picks that are not redirect sources
        # pass through with landed = url
        rf = self.redirect_final.withColumnRenamed("url", "_rf_url")
        pf = (
            picks.join(F.broadcast(rf), picks.url == rf._rf_url, "left")
            .select(
                "seq",
                "url",
                F.coalesce("landed", "url").alias("landed"),
                F.coalesce("loop_hit", F.lit(False)).alias("loop_hit"),
                "chain",
            )
            .persist()
        )

        # redirect intermediates → seen (WebCrawler.java:348,353); orig is
        # already seen — the seen-delta anti-join below dedups it away
        intermediates = pf.select(F.explode(F.col("chain")).alias("url"))

        loop_pages = pf.filter("loop_hit").select(
            "url",
            F.lit("HTML").alias("page_type_code"),
            F.lit(301).alias("status"),
            F.lit(t).alias("time_ms"),
            "seq",
        )

        moved = pf.filter(~F.col("loop_hit") & (F.col("landed") != F.col("url")))
        moved = moved.withColumn("lhost", url_host(F.col("landed")))
        # containment re-check on the landed URL (:218-221)
        moved_in = moved.filter(in_containment(F.col("lhost"), cfg.seed_domains))
        # several picks may land on the same URL: first (min seq) wins
        wland = Window.partitionBy("landed").orderBy("seq")
        moved_ok = (
            moved_in.withColumn("lrn", F.row_number().over(wland))
            .filter(F.col("lrn") == 1)
            .select(F.col("landed").alias("url"), "seq")
        )

        direct = pf.filter(~F.col("loop_hit") & (F.col("landed") == F.col("url"))).select("url", "seq")
        # a URL can already be visited via an earlier redirect landing —
        # such picks are consumed without storing (simulator parity)
        to_process = direct.unionByName(moved_ok).join(
            self.visited_pages.select("url"), "url", "left_anti"
        )

        # fetch join: broadcast the pick side while small (AQE re-plans the
        # strategy at scale), persist — every classify branch filters this
        tp = to_process
        if n_picked <= cfg.broadcast_pick_limit:
            tp = F.broadcast(tp)
        fetch_cols = ["url", "seq", "content_type", "text_norm", "html", "img_srcs"]
        if "img_alts" in self.wg.columns:  # caption source (absent in bare graphs)
            fetch_cols.append("img_alts")
        fetched = self.wg.join(tp, "url", "inner").select(*fetch_cols).persist()

        # picked-or-landed URLs absent from the webgraph → 404
        missing = (
            to_process.join(fetched.select("url"), "url", "left_anti")
            .select(
                "url",
                F.lit("HTML").alias("page_type_code"),
                F.lit(404).alias("status"),
                F.lit(t).alias("time_ms"),
                "seq",
            )
        )

        binary_fetches = fetched.filter(F.col("content_type") != "text/html")
        binaries = binary_fetches.select(
            "url",
            F.lit("BINARY").alias("page_type_code"),
            F.lit(200).alias("status"),
            F.lit(t).alias("time_ms"),
            "seq",
        )
        # every BINARY page gets one page_data row with the X1-coded type —
        # null when the content type falls through the 5-way switch, exactly
        # as addPageData(pageId, dataType, null) inserts a null code
        # (DatabaseHandler.java:177-178, WebCrawler.java:369-371)
        self._append(
            "page_data",
            binary_fetches.select(
                "url", data_type_code(F.col("content_type")).alias("data_type_code")
            ),
        )

        htmls = fetched.filter(F.col("content_type") == "text/html")

        # 6. content dedup — stored originals (J5) + first-writer window
        # (W2), as an index/confirm SPLIT (the 100-TB shape): the state
        # side first joins as an fp-only INDEX, so stored page text never
        # enters the per-sub-step exchange. Batch fps semi-join the index
        # (8-byte rows on both sides) to find fp collisions — actual
        # duplicates plus 2^-64 hash accidents; only the fp-matching
        # stored rows are then fetched (cm_hit) for the exact-equality
        # confirm join. Reference semantics are exact string equality
        # (DatabaseHandler.java:154-169): fp routes, never decides.
        # matched_fps is duplicate-sized (tiny → broadcast), which keeps
        # cm_hit duplicate-sized too, so the confirm join broadcasts as
        # well — the candidate batch never re-exchanges for the confirm.
        htmls = htmls.withColumn("fp", F.xxhash64("text_norm"))
        matched_fps = (
            htmls.select("fp")
            .join(self.content_map.select("fp"), "fp", "left_semi")
            .distinct()
        )
        cm_hit = (
            self.content_map.join(F.broadcast(matched_fps), "fp", "left_semi")
            .select(F.col("fp").alias("cfp"), "text", F.col("url").alias("stored_url"))
        )
        ded = (
            htmls.join(
                F.broadcast(cm_hit),
                (htmls.fp == cm_hit.cfp) & (htmls.text_norm == cm_hit.text),
                "left",
            )
            .drop("cfp", "text")
            .withColumn("rn", F.row_number().over(Window.partitionBy("text_norm").orderBy("seq")))
            .withColumn("first_url", F.first("url").over(Window.partitionBy("text_norm").orderBy("seq")))
        )
        dups = ded.filter(F.col("stored_url").isNotNull() | (F.col("rn") > 1)).select(
            "url",
            "seq",
            F.coalesce("stored_url", "first_url").alias("dup_to"),
        ).persist()
        originals = ded.filter(F.col("stored_url").isNull() & (F.col("rn") == 1)).persist()

        dup_pages = dups.select(
            "url",
            F.lit("DUPLICATE").alias("page_type_code"),
            F.lit(200).alias("status"),
            F.lit(t).alias("time_ms"),
            "seq",
        )
        dup_links = dups.select(
            F.col("url").alias("from_url"), F.col("dup_to").alias("to_url")
        )

        html_pages = originals.select(
            "url",
            F.lit("HTML").alias("page_type_code"),
            F.lit(200).alias("status"),
            F.lit(t).alias("time_ms"),
            "seq",
        )

        # 7. expansion — extraction X3/X4 in pure Catalyst, admission F1-F9
        parents = originals.select(
            F.col("url").alias("parent_url"),
            F.col("seq").alias("parent_seq"),
            F.col("html"),
        )
        hrefs = F.expr(r"""regexp_extract_all(html, '<a[^>]+href="([^"]*)"', 1)""")
        onclicks = F.expr(
            r"""regexp_extract_all(html, "location\\.href='([^']+)'", 1)"""
        )
        cand = parents.select(
            "parent_url",
            "parent_seq",
            F.posexplode(F.concat(hrefs, onclicks)).alias("pos", "raw"),
        )
        # staged projections: each derived column computed once as an
        # attribute, predicates reference attributes only (chained
        # withColumn+filter lets pushdown re-inline the canonicalization
        # chain into every conjunct — see functions/urls.py header)
        cand = cand.filter(~is_rejected_scheme(F.col("raw"))).select(          # F1
            "parent_url", "parent_seq", "pos",
            canonicalize_url(F.col("raw")).alias("curl"),                      # F2
        )
        cand = cand.select(
            "parent_url", "parent_seq", "pos", "curl",
            url_host(F.col("curl")).alias("chost"),
            is_binary_extension(F.col("curl")).alias("_binext"),
        )
        cand = cand.filter(
            (F.col("curl") != "")                                              # F3
            & F.col("chost").isNotNull()
            & in_containment(F.col("chost"), cfg.seed_domains)                 # F4
            & ~F.col("_binext")                                                # F7
        ).drop("_binext")
        # F9 robots: longest-match Allow/Disallow, allow wins ties (the
        # RobotsRules.allows rule as a Catalyst expression); null robots /
        # no disallow ⇒ allow (broadcast dim carries only disallow-bearing
        # hosts)
        cand = cand.join(
            F.broadcast(self.host_rules.withColumnRenamed("host", "chost")),
            "chost",
            "left",
        ).withColumn("path", _path_expr(F.col("curl")))
        dmatch = F.filter(
            F.col("disallow_prefixes"),
            lambda p: (p != "") & F.col("path").startswith(p),
        )
        amatch = F.filter(
            F.coalesce(F.col("allow_prefixes"), F.array().cast("array<string>")),
            lambda p: (p != "") & F.col("path").startswith(p),
        )
        dl = F.array_max(F.transform(dmatch, F.length))
        al = F.coalesce(F.array_max(F.transform(amatch, F.length)), F.lit(-1))
        cand = cand.filter(
            F.col("disallow_prefixes").isNull() | dl.isNull() | (al >= dl)
        ).drop("disallow_prefixes", "allow_prefixes", "path")
        # in-batch dedup, first occurrence wins (F6/U3)
        wb = Window.partitionBy("curl").orderBy("parent_seq", "pos")
        cand = cand.withColumn("brn", F.row_number().over(wb)).filter(F.col("brn") == 1)
        # seen-set anti join (F5/J2) — the workhorse dedup join. With the
        # Bloom sidecar on: definitely-unseen candidates check only the
        # small since-build seen delta; possible members confirm against
        # the full seen set — identical results, the bulk candidate set
        # never shuffles against the full seen table.
        seen_c = self.seen.withColumnRenamed("url", "curl")
        if self._sidecar is not None:
            tagged = cand.withColumn(
                "_maybe", self._sidecar.probe(F.col("curl"))
            ).persist()
            self._live_caches.append(tagged)
            fresh = tagged.filter(~F.col("_maybe")).drop("_maybe").join(
                self._seen_new.withColumnRenamed("url", "curl"), "curl", "left_anti"
            )
            confirmed = tagged.filter(F.col("_maybe")).drop("_maybe").join(
                seen_c, "curl", "left_anti"
            )
            unseen = fresh.unionByName(confirmed)
        else:
            unseen = cand.join(seen_c, "curl", "left_anti")
        # within-batch redirect-chain seen rule: the reference processes
        # picks sequentially, marking every redirect hop INCLUDING the
        # landing seen at chase time (WebCrawler.java:348,353) — before
        # later picks of the same tick expand their links. So a candidate
        # is dropped iff some pick with seq <= parent_seq chain-added it
        # (a pick's own chase precedes its own expansion, hence <=); a
        # LATER pick's chase must NOT drop it, the sequential reference
        # would have admitted it first. Cross-sub-step cases are covered
        # by the end-of-sub-step seen update below. batch_chain is
        # redirect-sources-of-one-batch sized → broadcast.
        batch_chain = (
            pf.select(F.explode("chain").alias("curl"),
                      F.col("seq").alias("chain_seq"))
            .groupBy("curl").agg(F.min("chain_seq").alias("chain_seq_min"))
        )
        unseen = (
            unseen.join(F.broadcast(batch_chain), "curl", "left")
            .filter(F.col("chain_seq_min").isNull()
                    | (F.col("chain_seq_min") > F.col("parent_seq")))
            .drop("chain_seq_min")
        )
        admitted = unseen.select(
            "parent_url", "parent_seq", "pos", F.col("curl").alias("url"),
            F.col("chost").alias("host"))

        # dense, order-preserving sequence assignment (distributed two-phase)
        with self._t('assign_seq'):
            admitted_seq, n_admitted = self._assign_seq(admitted, self._seq_base)
        self._seq_base += n_admitted

        new_frontier = (
            admitted_seq.join(F.broadcast(self.host_ip), "host", "left")
            .withColumn("ip", F.coalesce("ip", F.lit("0.0.0.0")))
            .select("seq", "url", "host", "ip", "parent_url")
            .persist()
        )
        adm_links = new_frontier.select(
            F.col("parent_url").alias("from_url"), F.col("url").alias("to_url")
        )

        # images (F10 data:-filter, X2 MIME map) + captions (img alt
        # text — the graft payload's caption source). The guarded src+alt
        # zip is the shared X4 helper (multimodal/pairs.caption_records).
        from webcrawler_spark.multimodal.pairs import caption_records

        img_pairs = (
            caption_records(originals)
            .withColumn(
                "ext",
                F.when(
                    F.element_at(F.split(F.element_at(F.split(F.col("src"), "/"), -1), r"\."), -1)
                    != F.element_at(F.split(F.col("src"), "/"), -1),
                    F.element_at(F.split(F.col("src"), r"\."), -1),
                ).otherwise(F.lit("")),
            )
            .select(
                "page_url", "src",
                image_mime(F.col("ext")).alias("content_type"), "alt",
            )
        )
        # reference-parity image records (src-only triples, like the
        # reference's DatabaseHandler image rows)
        imgs = img_pairs.select("page_url", "src", "content_type")

        # 8. buffer deltas + refresh cached state
        visits = missing.unionByName(loop_pages).unionByName(binaries) \
            .unionByName(dup_pages).unionByName(html_pages)
        visits = visits.persist()
        self._round_visits.append(visits)

        self._append("page_visits", visits)
        # picks that produced no page row (redirect moved away / landed on
        # an already-visited or out-of-scope URL) — consumed, page dropped
        consumed = picks.select("url").join(visits.select("url"), "url", "left_anti")
        self._append("consumed", consumed)
        self._append("links", dup_links.unionByName(adm_links))
        self._append("images", imgs)
        self._append("image_captions", img_pairs.select("page_url", "src", "alt"))
        self._append("page_admissions", new_frontier.select("seq", "url", "host", "ip"))

        new_cm = originals.select(
            "fp", F.col("text_norm").alias("text"), "url", F.col("seq").alias("vseq")
        )
        self._append("content_map", new_cm)
        self.content_map = self.content_map.unionByName(new_cm)

        self.visited_pages = self.visited_pages.unionByName(visits)

        new_seen = (
            intermediates.select("url")
            .unionByName(new_frontier.select("url"))
            .distinct()
        )
        seen_delta = new_seen.join(self.seen, "url", "left_anti").persist()
        # the buffered delta carries a monotone mark stamp (this substep's
        # post-assignment seq base) so resume can order seen marks against
        # evict_seen stamps; every stamp here is < any later eviction's
        # (evictions consume a seq) and > any earlier one
        self._append("seen", seen_delta.select(
            "url", F.lit(self._seq_base).alias("seq")))
        self.seen = self.seen.unionByName(seen_delta.select("url"))
        if self._sidecar is not None:
            self._seen_new = self._seen_new.unionByName(seen_delta.select("url"))

        picked_urls = picks.select("url")
        self.frontier = (
            self.frontier.join(F.broadcast(picked_urls), "url", "left_anti")
            .unionByName(new_frontier.select("seq", "url", "host", "ip"))
        )

        self.stats.visited += n_picked
        self._state_dirty = True
        if n_picked >= cfg.eager_state_threshold:
            self._truncate_state()
        # NOTE: picks/chase/htmls/dups/originals/visits/seen_delta/
        # new_frontier stay persisted until the round commit — buffered
        # delta frames reference them.
        self._live_caches.extend(
            (picks, pf, fetched, dups, originals, visits, seen_delta, new_frontier)
        )
        return n_picked

    def _truncate_state(self) -> None:
        """Materialize + lineage-truncate the five mutable state frames."""
        sp = self.cfg.state_partitions
        self.frontier = self._ckpt(self.frontier.coalesce(sp), "frontier")
        self.seen = self._ckpt(self.seen.coalesce(sp), "seen")
        self.visited_pages = self._ckpt(self.visited_pages.coalesce(sp), "visited_pages")
        self.content_map = self._ckpt(self.content_map.coalesce(sp), "content_map")
        self.host_state = self._ckpt(self.host_state.coalesce(sp), "host_state")
        self.site_domains = self._ckpt(self.site_domains.coalesce(sp), "site_domains")
        self._state_dirty = False
        if self.cfg.use_bloom_prefilter:
            # sharded (partitioned) sidecar — per-shard .npy bitsets on
            # shared storage, no broadcast; see functions/bloom.py for the
            # 10^10 memory math. Maintained INCREMENTALLY: the per-round
            # seen delta (_seen_new — exactly what the probe compensates
            # for via the exact anti-join at :619) is OR-ed into a
            # copy-on-write successor version; only delta-touched shards
            # are rewritten, the rest hard-link. A full rebuild happens
            # only at first build or when fill exceeds the 2× sizing
            # headroom (FPR past capacity is a cost knob, never results —
            # the exact confirm join guarantees that). Every version
            # lives at a fresh path (worker-side shard caches key on
            # path, so stale shards age out of the LRU naturally).
            from webcrawler_spark.functions.bloom import (
                build_sharded_bloom, update_sharded_bloom)
            from webcrawler_spark.functions.cuckoo import (
                build_sharded_cuckoo, update_sharded_cuckoo)

            # versions live under the snapshot store so a resumed driver
            # reopens the carried filter instead of rebuilding it
            # (_load_state). The pointer is recorded BEFORE the old
            # version is destroyed; a crash in between leaves the meta
            # pointing at a completed build. Truncation precedes the
            # round's commit, so any persisted version is a SUPERSET of
            # every committed seen state — supersets only add
            # confirm-join traffic, never false negatives.
            sdir = os.path.join(self.store.root, "sidecar")
            os.makedirs(sdir, exist_ok=True)
            old = self._sidecar
            if self.cfg.seen_filter == "cuckoo":
                if old is not None and not old.overfull:
                    self._sidecar = update_sharded_cuckoo(
                        old, self._seen_new, "url", dir=sdir)
                else:
                    self._sidecar = build_sharded_cuckoo(
                        self.seen, "url", headroom=2.0, dir=sdir)
            elif old is not None and not old.overfull:
                self._sidecar = update_sharded_bloom(
                    old, self._seen_new, "url", dir=sdir)
            else:
                self._sidecar = build_sharded_bloom(
                    self.seen, "url", fpp=0.01, headroom=2.0, dir=sdir)
            self.store.set_meta(sidecar_path=self._sidecar.path)
            # an empty delta hands the SAME version back — don't destroy it
            if old is not None and old is not self._sidecar:
                old.destroy()
            # GC orphan version dirs (crash between mkdtemp and _META, or
            # a predecessor left behind when the loader rejected it on
            # resume): anything under sidecar/ that is not the live
            # version. Safe single-driver: in-flight probes only ever
            # target the live path (old was destroyed just above anyway).
            live = os.path.basename(self._sidecar.path)
            for d in os.listdir(sdir):
                if d != live:
                    shutil.rmtree(os.path.join(sdir, d), ignore_errors=True)
            self._seen_new = self.spark.createDataFrame([], "url string")

    # ------------------------------------------------------------------
    def evict_seen(self, urls: DataFrame, col: str = "url") -> int:
        """TTL re-crawl eviction — the capability the cuckoo sidecar
        layout exists for (functions/cuckoo.py): make already-fetched
        URLs admissible again, so the next link to them fetches a fresh
        version. The reference crawler is one-shot; this is the
        continuous-crawl extension a 10^10-frontier deployment needs,
        designed against the exact-seen source of truth:

        * only URLs actually in ``seen`` (as stored — canonical form)
          and NOT still queued in the frontier are evicted (evicting a
          queued URL would double-fetch it);
        * the exact ``seen`` state shrinks — that ALONE restores
          admissibility, whatever the prefilter answers;
        * cuckoo sidecar: fingerprints are removed via
          ``delete_guarded`` (an eviction whose code a surviving seen
          URL aliases stays resident — cost, never results);
        * Bloom sidecar: bits cannot be unset — evicted URLs stay as
          stale superset entries routed to the exact confirm join
          (cost, never results). ``sidecar ⊇ seen`` holds either way;
        * re-fetched pages append NEW page/visit rows (a fresh version
          seq); unchanged content dedups against the original via the
          W2 first-writer rule — both intended re-crawl semantics;
        * durability: the eviction is committed IMMEDIATELY as its own
          store round (an ``evictions`` delta stamped with a consumed
          global seq), so a resumed driver reconstructs post-eviction
          ``seen``/frontier — see ``_load_state``. Call between ``run``
          sessions, not mid-round.

        Returns the number of URLs evicted."""
        ev = (
            urls.select(F.col(col).alias("url")).distinct()
            .join(self.seen, "url", "left_semi")
            .join(self.frontier.select("url"), "url", "left_anti")
            .localCheckpoint(eager=True)  # stable snapshot: used 3× below
        )
        n = ev.count()
        if n == 0:
            return 0
        # consume one global seq as the eviction stamp: strictly greater
        # than every prior seen-mark stamp, strictly less than every
        # later one (later substeps stamp with a base advanced past this)
        stamp = self._seq_base
        self._seq_base += 1
        last = self.store.get_meta("last_round")
        ecommit = (last if last is not None else -1) + 1
        # two stamp spaces, each matching what it orders against:
        # evict_seq (global seq) orders against SEEN marks, which are
        # stamped per-substep with the post-assignment seq base;
        # evict_time_ms orders against VISIT rows, whose time_ms is the
        # round tick — a visit row's per-row seq can be an OLD pick's seq
        # (redirect landings carry the picker's seq), so seq-space would
        # misclassify a post-eviction landing by a pre-eviction pick.
        # The earliest post-eviction round is ecommit+1, so its tick is
        # the threshold (rule: visited iff max time_ms >= threshold).
        self._append("evictions", ev.select(
            "url", F.lit(stamp).alias("evict_seq"),
            F.lit((ecommit + 1) * self.cfg.tick_ms).alias("evict_time_ms")))
        self.seen = self._ckpt(self.seen.join(ev, "url", "left_anti"), "seen")
        self._seen_new = self._seen_new.join(ev, "url", "left_anti")
        # an evicted URL is no longer "visited": the re-pick must pass the
        # visited_pages guard (engine :508) and STORE a fresh page version
        # instead of being consumed-without-storing. The committed
        # page_visits history keeps the old version rows (versioned store).
        self.visited_pages = self._ckpt(
            self.visited_pages.join(ev, "url", "left_anti"), "visited_pages")
        if self._sidecar is not None and hasattr(self._sidecar, "delete_guarded"):
            self._sidecar.delete_guarded(ev, self.seen, "url")
        # commit now, as a virtual round (advances the cursor by one tick
        # — a one-tick politeness idle, nothing else): eviction must not
        # be lost if the driver exits before another crawl round commits
        self._commit(ecommit)
        self._start_round = max(self._start_round, ecommit + 1)
        return n

    # ------------------------------------------------------------------
    def _resolve_redirects(self) -> DataFrame:
        """Closure of the redirect graph (J8), computed once per webgraph:
        (url, landed, chain, loop_hit) for every redirect source. Bounded
        depth + cycle guard exactly as WebCrawler.java:346-358: the chain
        holds the canonicalized hops marked seen (:348,353); a repeated hop
        or depth > MAX_REDIRECT_DEPTH sets loop_hit."""
        chase = self.wg_redirects.select(
            F.col("url").alias("orig"),
            F.col("url").alias("landed"),
            F.array(F.col("url")).alias("chain"),
            F.lit(0).alias("depth"),
            F.lit(False).alias("loop_hit"),
            F.lit(False).alias("done"),
        )
        for _ in range(MAX_REDIRECT_DEPTH + 1):
            nxt = F.when(
                F.col("redirect_to").isNotNull() & ~F.col("done"),
                canonicalize_url(F.col("redirect_to")),
            )
            chase = (
                chase.join(
                    F.broadcast(self.wg_redirects.withColumnRenamed("url", "landed")),
                    "landed",
                    "left",
                )
                .withColumn("nxt", nxt)
                .withColumn(
                    "hit_loop",
                    F.col("nxt").isNotNull()
                    & (F.array_contains("chain", F.col("nxt"))
                       | (F.col("depth") + 1 > MAX_REDIRECT_DEPTH)),
                )
                .select(
                    "orig",
                    F.when(F.col("nxt").isNotNull() & ~F.col("hit_loop"), F.col("nxt"))
                    .otherwise(F.col("landed"))
                    .alias("landed"),
                    F.when(F.col("nxt").isNotNull() & ~F.col("hit_loop"),
                           F.array_union("chain", F.array(F.col("nxt"))))
                    .otherwise(F.col("chain"))
                    .alias("chain"),
                    (F.col("depth") + F.when(F.col("nxt").isNotNull(), 1).otherwise(0)).alias("depth"),
                    (F.col("loop_hit") | F.col("hit_loop")).alias("loop_hit"),
                    (F.col("done") | F.col("nxt").isNull() | F.col("hit_loop")).alias("done"),
                )
            )
        return chase.select(F.col("orig").alias("url"), "landed", "chain", "loop_hit")

    # ------------------------------------------------------------------
    def _assign_seq(self, df: DataFrame, start: int) -> tuple[DataFrame, int]:
        """Dense order-preserving sequence over (parent_seq, pos) without a
        single-partition window: range-partition → per-partition counts
        (JVM aggregation, #partitions rows to the driver) → prefix-sum
        offsets → per-partition row_number. Returns (frame, total)."""
        n = max(1, min(self.spark.sparkContext.defaultParallelism, 32))
        d = df.repartitionByRange(n, "parent_seq", "pos").withColumn(
            "_pid", F.spark_partition_id()
        ).localCheckpoint(eager=True)  # pin partition ids before two uses
        counts = {r["_pid"]: r["cnt"] for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
        if not counts:
            return d.withColumn("seq", F.lit(None).cast("long")).drop("_pid"), 0
        offsets, acc = {}, start
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        wp = Window.partitionBy("_pid").orderBy("parent_seq", "pos")
        out = (
            d.withColumn("_rn", F.row_number().over(wp))
            .withColumn("seq", omap[F.col("_pid")] + F.col("_rn") - 1)
            .drop("_pid", "_rn")
        )
        return out, acc - start

    # ------------------------------------------------------------------
    def run(self) -> CrawlStats:
        cfg = self.cfg
        round_ = self._start_round
        pending = False
        while round_ < cfg.max_rounds:
            if cfg.max_pages is not None and self.stats.stored >= cfg.max_pages:
                break
            with self._t('frontier.empty?'):
                frontier_empty = self.frontier.limit(1).count() == 0
            if frontier_empty:
                break
            t = round_ * cfg.tick_ms
            substep, fetched = 0, 0
            self._round_visits = []
            while True:
                n = self._substep(t)
                if n == 0:
                    break
                fetched += n
                substep += 1
            if fetched > 0:
                # small sub-steps stayed lazy (plans bounded by
                # substeps/round); truncate once per round. Large sub-steps
                # already truncated inline (eager_state_threshold).
                if self._state_dirty:
                    self._truncate_state()
                with self._t('stored.count'):
                    rv = self._round_visits[0]
                    for v in self._round_visits[1:]:
                        rv = rv.unionByName(v)
                    self.stats.stored += rv.count()
            self.stats.rounds += 1
            self.stats.substeps += substep
            self.stats.per_round.append({"round": round_, "fetched": fetched})
            pending = True
            if (round_ + 1) % cfg.checkpoint_every == 0:
                with self._t('commit'):
                    self._commit(round_)
                pending = False
                for c in self._live_caches:
                    c.unpersist()
                self._live_caches = []
            round_ += 1
        if pending:
            self._commit(round_ - 1)
            for c in self._live_caches:
                c.unpersist()
            self._live_caches = []
        # a later run() on this instance continues where this one stopped
        # (the evict_seen flow: run → evict → run)
        self._start_round = max(self._start_round, round_)
        return self.stats

    # ------------------------------------------------------------------
    # result views (read back from the store deltas)
    # ------------------------------------------------------------------
    def trace_df(self) -> DataFrame:
        return self._read_all("trace")

    def pages_df(self) -> DataFrame:
        """Reference-census page view: one row per visit plus synthesized
        FRONTIER rows for admitted-never-visited URLs (the reference's
        page table shape). For stores with re-crawl evictions this view
        reports HISTORY — a re-crawled URL appears once per stored
        version, and a re-admitted-but-not-yet-repicked URL is not
        re-synthesized as FRONTIER (it already has version rows); the
        live queue is ``self.frontier``/``seen_df``."""
        visits = self._read_all("page_visits")
        adm = self._read_all("page_admissions")
        consumed = self._read_all("consumed")
        frontier_rows = adm.join(visits.select("url"), "url", "left_anti")
        if consumed is not None:
            # consumed-without-storing picks have no page row at all
            frontier_rows = frontier_rows.join(consumed, "url", "left_anti")
        frontier_rows = frontier_rows.select(
            "url",
            F.lit("FRONTIER").alias("page_type_code"),
            F.lit(None).cast("int").alias("status"),
            F.lit(None).cast("long").alias("time_ms"),
            "seq",
        )
        return visits.unionByName(frontier_rows)

    def links_df(self) -> DataFrame:
        return self._read_all("links")

    def images_df(self) -> DataFrame:
        return self._read_all("images")

    def image_captions_df(self) -> DataFrame | None:
        """(page_url, src, alt) — the crawl-extracted caption source for
        the image+caption pair table (multimodal/pairs.py; north_rule's
        'Iceberg tables of image + caption pairs'). None before the
        first committed round, like every _read_all accessor."""
        return self._read_all("image_captions")

    def page_data_df(self) -> DataFrame | None:
        return self._read_all("page_data")

    def sites_df(self) -> DataFrame | None:
        """(domain, robots_content, sitemap_content) — one row per domain
        first dequeued, the reference's crawldb.site table
        (DatabaseHandler.java:21-47). sitemap_content is
        Arrays.toString(sitemaps) — "[]" for a live robots with no Sitemap
        line — and both content columns are null for domains whose robots
        is missing or an HTML page (WebCrawler.java:96-100,108-112)."""
        return self._read_all("site")

    def metrics_df(self) -> DataFrame:
        return self._read_all("metrics")

    def seen_df(self) -> DataFrame:
        return self._stored_seen(
            self._read_all("page_admissions"),
            self._read_all("seen"),
            self._read_all("evictions"),
        )

    def _stored_seen(self, adm: DataFrame, seen_extra: DataFrame | None,
                     evictions: DataFrame | None) -> DataFrame:
        """Committed seen set. Without evictions: the append-only union
        (admissions ∪ redirect-hop marks). With evictions: a URL is seen
        iff its latest seen-mark stamp (per-row admission seq, or the
        per-substep stamp on the seen delta) is GREATER than its latest
        eviction stamp — evictions consume a global seq, so marks never
        tie a stamp (see ``evict_seen``)."""
        if evictions is None:
            seen = adm.select("url")
            if seen_extra is not None:
                seen = seen.unionByName(seen_extra.select("url"))
            return seen.distinct()
        marks = adm.select("url", "seq")
        if seen_extra is not None:
            marks = marks.unionByName(seen_extra.select("url", "seq"))
        last_ev = evictions.groupBy("url").agg(
            F.max("evict_seq").alias("evict_seq"))
        return (
            marks.groupBy("url").agg(F.max("seq").alias("mark_seq"))
            .join(last_ev, "url", "left")
            .filter(F.col("evict_seq").isNull()
                    | (F.col("mark_seq") > F.col("evict_seq")))
            .select("url")
        )
