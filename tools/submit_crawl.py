"""``spark-submit`` entrypoint for the crawl engine (north_rule deployment).

The rule's deployment shape is *"run via spark-submit --py-files on a
multi-executor cluster"*. This script is that driver program:

    python tools/build_pyfiles.py dist/webcrawler_spark.zip
    spark-submit --master spark://...:7077 --num-executors 64 \
        --py-files dist/webcrawler_spark.zip \
        tools/submit_crawl.py \
        --store hdfs:///crawl/store --webgraph hdfs:///crawl/webgraph \
        --robots hdfs:///crawl/robots --rounds 10000 [--resume] [--bloom]

Everything cluster-shaped comes from the ``spark-submit`` command line —
master URL, executor count/memory, dynamic allocation. The script asks
``get_spark(master="")`` to leave the master untouched and only layer the
engine's tuned SQL confs (AQE, shuffled-hash joins, hugeMethodLimit JIT
cap, Arrow) on top, so the SAME command runs at N and 4N executors — the
two-cluster-size criterion — with no code change.

Inputs are parquet paths (production) or, when omitted, the deterministic
fixture webgraph (``--hosts/--pages-base`` — sandbox/CI shape; no external
data). Outputs: the engine snapshot store at ``--store`` (one snapshot per
round, resume manifest, per-partition lineage metrics), result exports at
``<store>/export/{trace,seen,pages}`` as parquet, and ONE JSON line on
stdout with the run stats. ``--resume`` continues from the store's latest
snapshot (kill-and-resume is trace-equality-tested in
tests/test_spark_submit.py against the reference-semantics simulator).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="webcrawler_spark crawl driver")
    ap.add_argument("--store", required=True, help="snapshot store root")
    ap.add_argument("--rounds", type=int, default=300, help="max BSP rounds")
    ap.add_argument("--webgraph", default=None, help="webgraph parquet path")
    ap.add_argument("--robots", default=None, help="robots parquet path")
    ap.add_argument("--hosts", type=int, default=8,
                    help="fixture hosts (when --webgraph omitted)")
    ap.add_argument("--pages-base", type=int, default=8,
                    help="fixture pages/host base (when --webgraph omitted)")
    ap.add_argument("--seeds", default=None,
                    help="comma-separated seed URLs (default: reference seeds)")
    ap.add_argument("--checkpoint-every", type=int, default=5)
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="override spark.sql.shuffle.partitions (size to "
                         "cluster cores; default session.py's 32)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the store's latest snapshot")
    ap.add_argument("--bloom", action="store_true",
                    help="enable the sharded Bloom seen-set prefilter")
    ap.add_argument("--no-export", action="store_true",
                    help="skip the <store>/export parquet result views")
    ap.add_argument("--compact", action="store_true",
                    help="before (or instead of) crawling, merge the "
                         "store's committed per-round delta dirs "
                         "(storage/compaction.py); with --rounds 0 this "
                         "is a pure maintenance run")
    args = ap.parse_args(argv)

    # imports resolve from --py-files; nothing here assumes a repo checkout
    from webcrawler_spark.crawl.engine import CrawlConfig, CrawlEngine
    from webcrawler_spark.session import get_spark
    from webcrawler_spark.sources.fixtures import SEED_URLS, make_webgraph

    # master="" → spark-submit's --master/--num-executors win (session.py)
    spark = get_spark(app_name="webcrawler_spark_crawl", master="",
                      shuffle_partitions=args.shuffle_partitions)

    if args.webgraph:
        wg = spark.read.parquet(args.webgraph)
        robots = spark.read.parquet(args.robots)
    else:
        wg_pd, robots_pd = make_webgraph(
            n_hosts=args.hosts, pages_per_host_base=args.pages_base
        )
        wg = spark.createDataFrame(wg_pd)
        robots = spark.createDataFrame(robots_pd)

    compacted = None
    if args.compact:
        from webcrawler_spark.storage.compaction import compact_crawl_store

        compacted = compact_crawl_store(spark, args.store)
        if args.rounds <= 0:  # pure maintenance invocation
            print(json.dumps({"compacted": compacted, "store": args.store}),
                  flush=True)
            spark.stop()
            return

    seeds = args.seeds.split(",") if args.seeds else list(SEED_URLS)
    cfg = CrawlConfig(
        store_root=args.store,
        max_rounds=args.rounds,
        checkpoint_every=args.checkpoint_every,
        collect_metrics=True,
        use_bloom_prefilter=args.bloom,
    )
    eng = CrawlEngine(spark, wg, robots, seeds, cfg, resume=args.resume)
    t0 = time.time()
    stats = eng.run()
    wall = round(time.time() - t0, 2)

    trace_rows = None
    if not args.no_export:
        for name, df in (("trace", eng.trace_df()), ("seen", eng.seen_df()),
                         ("pages", eng.pages_df()), ("sites", eng.sites_df())):
            if df is not None:
                df.write.mode("overwrite").parquet(f"{args.store}/export/{name}")
        trace_rows = spark.read.parquet(f"{args.store}/export/trace").count()

    print(json.dumps({
        "visited": stats.visited,
        "stored": stats.stored,
        "rounds": stats.rounds,
        "substeps": stats.substeps,
        "trace_rows": trace_rows,
        "wall_s": wall,
        "store": args.store,
        "resumed": bool(args.resume),
        "compacted": compacted,
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
    sys.exit(0)
