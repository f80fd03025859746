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
      4. fetch        : broadcast picks ⋈ webgraph (replaces live HTTP, S2)
      5. redirect     : bounded iterative chase with cycle guard (J8)
      6. classify     : missing→404 / binary→BINARY (S3) / dup→DUPLICATE
                        via content_map join + first-writer window (J5/W2)
      7. expand       : href+onclick extraction (X3/X4, pure Catalyst) →
                        admission filters F1-F7+F9 (cheap native filters
                        first) → batch dedup → anti-join seen (J2) →
                        dense seq assignment (distributed two-phase)
      8. append       : trace/links/images/pages deltas, seen, frontier

State layout is append-only deltas (Iceberg-ready; parquet fallback per
SURVEY §7 step 3): ``trace``, ``links``, ``images``, ``content_map``,
``page_admissions``, ``page_visits``, ``seen`` are appended per round;
``frontier`` is *derived* — admissions LEFT ANTI visited — so resume from
any snapshot needs no mutable table. ``host_state`` (tiny) is rewritten.

Scale notes (the 1000-executor story):
* frontier/seen joins hash-partition on url; the hot-host skew head never
  concentrates a join because eligibility+pick bound per-host work to one
  URL per round *by construction* (the politeness budget is the skew cap).
* picks per sub-step ≤ #IPs → always the broadcast side of the fetch join.
* sequence assignment avoids a single-partition window: range-partition by
  (parent_seq, pos), count per partition (JVM-only), prefix-sum offsets on
  the driver (#partitions values), then a per-partition window.
* per-round metrics record per-partition row counts (lineage per
  north_rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webcrawler_spark.functions.mime import image_mime
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


@dataclass
class CrawlConfig:
    seed_domains: tuple[str, ...] = ("gov.si",)
    tick_ms: int = TICK_MS
    max_pages: int | None = None
    max_rounds: int = 10_000
    store_root: str = "/tmp/crawl_store"
    checkpoint_every: int = 1  # rounds between snapshot commits


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
    ):
        self.spark = spark
        self.cfg = config or CrawlConfig()
        self.store = SnapshotStore(spark, self.cfg.store_root)
        self.stats = CrawlStats()

        # webgraph: the synthetic web (REF-ONLY live HTTP replaced, S2).
        # Cached once; every fetch is broadcast(picks) ⋈ webgraph.
        self.wg = webgraph.persist()
        self.wg_redirects = (
            self.wg.select("url", "redirect_to")
            .filter(F.col("redirect_to").isNotNull())
            .persist()
        )
        # host dims, all broadcast-sized: host→ip, host→delay, host→disallow
        self.host_ip = self.wg.select("host", "ip").distinct().persist()
        live_robots = robots.filter(~F.col("is_html_page"))  # WebCrawler.java:108-112
        self.host_delay = (
            live_robots.select(
                "host",
                F.when(F.col("crawl_delay_s") > 0, F.col("crawl_delay_s") * 1000)
                .otherwise(F.lit(self.cfg.tick_ms))
                .alias("delay_ms"),  # zero-delay fallback, WebCrawler.java:178-179
            ).persist()
        )
        self.host_disallow = (
            live_robots.select("host", "disallow_prefixes")
            .filter(F.size("disallow_prefixes") > 0)
            .persist()
        )

        # --- mutable state (cached frames; deltas appended to the store) ---
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
        self.content_map = spark.createDataFrame(
            [], "text string, url string, vseq long"
        )
        self.visited_pages = spark.createDataFrame(
            [], "url string, page_type_code string, status int, time_ms long, seq long"
        )
        self._seq_base = len(seeds)
        self._append_admissions(self.frontier, round_=0, substep=999)  # seeds

    # ------------------------------------------------------------------
    # delta appends
    # ------------------------------------------------------------------
    def _append(self, table: str, df: DataFrame, round_: int, substep: int = 0) -> None:
        p = f"{self.store.root}/{table}/delta_r{round_:06d}_s{substep:03d}"
        df.write.mode("overwrite").parquet(p)

    def _read_all(self, table: str) -> DataFrame | None:
        import glob
        paths = sorted(glob.glob(f"{self.store.root}/{table}/delta_*"))
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def _append_admissions(self, df: DataFrame, round_: int, substep: int = 0) -> None:
        self._append("page_admissions", df.select("seq", "url", "host", "ip"), round_, substep)

    def _metrics(self, round_: int, substep: int, table: str, df: DataFrame) -> None:
        """Per-partition lineage metrics (north_rule)."""
        m = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .select(
                F.lit(round_).alias("round"),
                F.lit(substep).alias("substep"),
                F.lit(table).alias("table"),
                "partition_id",
                F.col("count").alias("rows"),
            )
        )
        self._append("metrics", m, round_, substep)

    # ------------------------------------------------------------------
    # one sub-step at logical time t; returns number of URLs fetched
    # ------------------------------------------------------------------
    def _substep(self, t: int, round_: int, substep: int) -> int:
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
        n_picked = picks.count()
        if n_picked == 0:
            picks.unpersist()
            return 0

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
            .localCheckpoint(eager=True)
        )

        # trace records the *picked* URL, pre-redirect (logs1 format, S11)
        trace = picks.select(
            F.lit(t).alias("time_ms"), "seq", "url", "host"
        )
        self._append("trace", trace, round_, substep)
        self._metrics(round_, substep, "trace", trace)

        # 4. fetch: broadcast the small side into the webgraph (S2)
        hits = self.wg.join(F.broadcast(picks.select("seq", "url")), "url", "inner")

        # 5. redirect chase (J8) — bounded iterations, cycle guard
        chase = hits.filter(F.col("redirect_to").isNotNull()).select(
            F.col("url").alias("orig"),
            F.col("seq"),
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
                    & (F.array_contains("chain", F.col("nxt")) | (F.col("depth") + 1 > MAX_REDIRECT_DEPTH)),
                )
                .select(
                    "orig",
                    "seq",
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
        chase = chase.persist()

        # redirect intermediates → seen (WebCrawler.java:348,353); orig is
        # already seen — the seen-delta anti-join below dedups it away
        intermediates = chase.select(F.explode(F.col("chain")).alias("url"))

        loop_pages = chase.filter("loop_hit").select(
            F.col("orig").alias("url"),
            F.lit("HTML").alias("page_type_code"),
            F.lit(301).alias("status"),
            F.lit(t).alias("time_ms"),
            "seq",
        )

        moved = chase.filter(~F.col("loop_hit") & (F.col("landed") != F.col("orig")))
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

        direct = hits.filter(F.col("redirect_to").isNull()).select("url", "seq")
        # a URL can already be visited via an earlier redirect landing —
        # such picks are consumed without storing (simulator parity)
        to_process = direct.unionByName(moved_ok).join(
            self.visited_pages.select("url"), "url", "left_anti"
        ).persist()

        # picked-or-landed URLs absent from the webgraph → 404
        known = self.wg.join(
            F.broadcast(to_process.select("url")), "url", "left_semi"
        ).select("url")
        missing = (
            picks.select("url", "seq")
            .join(F.broadcast(hits.select("url")), "url", "left_anti")
            .unionByName(
                to_process.join(F.broadcast(known), "url", "left_anti")
            )
            .select(
                "url",
                F.lit("HTML").alias("page_type_code"),
                F.lit(404).alias("status"),
                F.lit(t).alias("time_ms"),
                "seq",
            )
        )

        body = self.wg.join(
            F.broadcast(to_process), "url", "inner"
        ).select("url", "seq", "content_type", "text_norm", "html", "img_srcs")

        binaries = body.filter(F.col("content_type") != "text/html").select(
            "url",
            F.lit("BINARY").alias("page_type_code"),
            F.lit(200).alias("status"),
            F.lit(t).alias("time_ms"),
            "seq",
        )

        htmls = body.filter(F.col("content_type") == "text/html").persist()

        # 6. content dedup — stored originals (J5) + first-writer window (W2)
        cm = self.content_map.select(
            F.col("text"), F.col("url").alias("stored_url")
        )
        ded = (
            htmls.join(cm, htmls.text_norm == cm.text, "left")
            .drop("text")
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
        cand = (
            cand.filter(~is_rejected_scheme(F.col("raw")))                       # F1
            .withColumn("curl", canonicalize_url(F.col("raw")))                  # F2
            .filter(F.col("curl") != "")                                         # F3
            .withColumn("chost", url_host(F.col("curl")))
            .filter(F.col("chost").isNotNull())
            .filter(in_containment(F.col("chost"), cfg.seed_domains))            # F4
            .filter(~is_binary_extension(F.col("curl")))                         # F7
        )
        # F9 robots (broadcast dim; null robots ⇒ allow)
        cand = (
            cand.join(
                F.broadcast(self.host_disallow.withColumnRenamed("host", "chost")),
                "chost",
                "left",
            )
            .withColumn("path", _path_expr(F.col("curl")))
            .filter(
                F.col("disallow_prefixes").isNull()
                | ~F.exists(
                    "disallow_prefixes", lambda p: F.col("path").startswith(p)
                )
            )
        )
        # in-batch dedup, first occurrence wins (F6/U3)
        wb = Window.partitionBy("curl").orderBy("parent_seq", "pos")
        cand = cand.withColumn("brn", F.row_number().over(wb)).filter(F.col("brn") == 1)
        # seen-set anti join (F5/J2) — the workhorse dedup join
        admitted = cand.join(
            self.seen.withColumnRenamed("url", "curl"), "curl", "left_anti"
        ).select("parent_url", "parent_seq", "pos", F.col("curl").alias("url"),
                 F.col("chost").alias("host")).persist()

        # dense, order-preserving sequence assignment (distributed two-phase)
        admitted_seq = self._assign_seq(admitted, self._seq_base)
        n_admitted = admitted_seq.count()
        self._seq_base += n_admitted

        new_frontier = (
            admitted_seq.join(F.broadcast(self.host_ip), "host", "left")
            .withColumn("ip", F.coalesce("ip", F.lit("0.0.0.0")))
            .select("seq", "url", "host", "ip")
            .persist()
        )
        adm_links = admitted_seq.select(
            F.col("parent_url").alias("from_url"), F.col("url").alias("to_url")
        )

        # images (F10 data:-filter, X2 MIME map)
        imgs = (
            originals.select("url", F.explode("img_srcs").alias("src"))
            .filter(~F.col("src").startswith("data"))
            .withColumn(
                "ext",
                F.when(
                    F.element_at(F.split(F.element_at(F.split(F.col("src"), "/"), -1), r"\."), -1)
                    != F.element_at(F.split(F.col("src"), "/"), -1),
                    F.element_at(F.split(F.col("src"), r"\."), -1),
                ).otherwise(F.lit("")),
            )
            .select(
                F.col("url").alias("page_url"),
                "src",
                image_mime(F.col("ext")).alias("content_type"),
            )
        )

        # 8. append deltas + refresh cached state
        visits = missing.unionByName(loop_pages).unionByName(binaries) \
            .unionByName(dup_pages).unionByName(html_pages)
        visits = visits.persist()
        n_visits = visits.count()

        self._append("page_visits", visits, round_, substep)
        # picks that produced no page row (redirect moved away / landed on
        # an already-visited or out-of-scope URL) — consumed, page dropped
        consumed = picks.select("url").join(visits.select("url"), "url", "left_anti")
        self._append("consumed", consumed, round_, substep)
        self._append("links", dup_links.unionByName(adm_links), round_, substep)
        self._append("images", imgs, round_, substep)
        self._metrics(round_, substep, "page_visits", visits)
        self._metrics(round_, substep, "admissions", new_frontier)
        self._append_admissions(new_frontier, round_, substep)

        new_cm = originals.select(
            F.col("text_norm").alias("text"), "url", F.col("seq").alias("vseq")
        )
        self._append("content_map", new_cm, round_, substep)
        self.content_map = self.content_map.unionByName(new_cm).localCheckpoint(eager=True)

        self.visited_pages = self.visited_pages.unionByName(visits).localCheckpoint(eager=True)

        new_seen = (
            intermediates.select("url")
            .unionByName(new_frontier.select("url"))
            .distinct()
        )
        seen_delta = new_seen.join(self.seen, "url", "left_anti").persist()
        self._append("seen", seen_delta, round_, substep)
        self.seen = self.seen.unionByName(seen_delta.select("url")).localCheckpoint(eager=True)

        picked_urls = picks.select("url")
        self.frontier = (
            self.frontier.join(F.broadcast(picked_urls), "url", "left_anti")
            .unionByName(new_frontier.select("seq", "url", "host", "ip"))
            .localCheckpoint(eager=True)
        )

        self.stats.visited += n_picked
        self.stats.stored += n_visits
        for x in (picks, chase, htmls, dups, originals, admitted,
                  to_process, visits, seen_delta, new_frontier):
            x.unpersist()
        return n_picked

    # ------------------------------------------------------------------
    def _assign_seq(self, df: DataFrame, start: int) -> DataFrame:
        """Dense order-preserving sequence over (parent_seq, pos) without a
        single-partition window: range-partition → per-partition counts
        (JVM aggregation, #partitions rows to the driver) → prefix-sum
        offsets → per-partition row_number."""
        n = max(1, min(self.spark.sparkContext.defaultParallelism, 32))
        d = df.repartitionByRange(n, "parent_seq", "pos").withColumn(
            "_pid", F.spark_partition_id()
        ).localCheckpoint(eager=True)  # pin partition ids before two uses
        counts = {r["_pid"]: r["cnt"] for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
        if not counts:
            return d.withColumn("seq", F.lit(None).cast("long")).drop("_pid")
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
        return out

    # ------------------------------------------------------------------
    def run(self) -> CrawlStats:
        cfg = self.cfg
        round_ = 0
        while round_ < cfg.max_rounds:
            if cfg.max_pages is not None and self.stats.stored >= cfg.max_pages:
                break
            if self.frontier.limit(1).count() == 0:
                break
            t = round_ * cfg.tick_ms
            substep, fetched = 0, 0
            while True:
                n = self._substep(t, round_, substep)
                if n == 0:
                    break
                fetched += n
                substep += 1
            self.stats.rounds += 1
            self.stats.substeps += substep
            self.stats.per_round.append({"round": round_, "fetched": fetched})
            round_ += 1
        return self.stats

    # ------------------------------------------------------------------
    # result views (read back from the store deltas)
    # ------------------------------------------------------------------
    def trace_df(self) -> DataFrame:
        return self._read_all("trace")

    def pages_df(self) -> DataFrame:
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

    def seen_df(self) -> DataFrame:
        adm = self._read_all("page_admissions").select("url")
        extra = self._read_all("seen")
        return adm.unionByName(extra.select("url")).distinct() if extra is not None else adm.distinct()
