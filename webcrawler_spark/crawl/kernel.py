"""The crawl round *kernel* at production batch size — the compute that one
BSP round performs per sub-step once the frontier is wide (10^10-URL scale:
millions of eligible URLs per tick), extracted from the engine for scaling
measurement.

Why this exists: on a single machine the full BSP loop is wall-clock-bound
by the politeness budget (each tick's eligible set at fixture scale is
tiny, so the driver's ~10 jobs/sub-step dominate and more cores cannot
help). On a 1000-executor cluster the same loop runs the SAME dataflow
below over millions of rows per sub-step — that dataflow is what must
scale, and it is what `bench.py` measures at two parallelism levels for
the north_rule's two-cluster-size criterion.

Stages (mirroring engine._substep, citations in engine.py):
  candidates → F1 scheme filter → F2 canonicalize → host → F4 containment
  → F7 binary-ext → robots prefix filter → in-batch first-occurrence
  window (U3/W1) → LEFT ANTI vs seen (F5/J2) → content fingerprint
  dedup first-writer window (J5/W2)

Inputs are generated *inside Spark* (range + column expressions — no
driver-side data), deterministic in (n_candidates, n_seen). For the timed
scaling measurement they are materialized to parquet first
(``materialize_round_inputs``) and the kernel reads them back: in a real
round the candidate batch is the previous round's stored link-extraction
output and the seen set is carried state, so the at-scale job reads
columnar storage — it does not re-derive its input from a generator fused
into the scan (the generator's string-concat chain is itself memory-bus-
bound and distorts both the absolute rate and the scaling ratio).

Codegen note (measured here, applied in session.py/bench.py): the fused
admission stage's generated method is >8 KB of bytecode, past the JVM
JIT's DontCompileHugeMethods limit but under Spark's 64 KB fallback
ceiling, so without intervention it runs in the JVM *bytecode
interpreter* — 105 s vs 3.2 s per 16M rows at 16 cores for the same
filter chain. ``spark.sql.codegen.hugeMethodLimit=8000`` makes Spark
fall back to per-operator codegen (small JIT-able classes) for any such
stage. A hash-keyed first-occurrence variant (groupBy (xxhash64, murmur3)
carrying ``min_by(url, ord)``) was measured within host noise of the
exact string-keyed groupBy once that JIT fix landed (best-of-3
interleaved, 32M rows: 26.5 s vs 27.6 s at 16 cores), so the exact
string key stays.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webcrawler_spark.functions.text import collapse_ws
from webcrawler_spark.functions.urls import (
    canonicalize_url,
    in_containment,
    is_binary_extension,
    is_rejected_scheme,
    url_host,
)


def synth_candidates(spark: SparkSession, n: int, n_hosts: int = 50_000) -> DataFrame:
    """n messy candidate links: ~1.5 raw URLs per canonical target, with
    query strings / fragments / '.html' noise / traps / out-of-scope hosts."""
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % n_hosts).alias("h"),
        (F.col("id") % 7).alias("noise"),
        ((F.col("id") * 2654435761) % 1000003).alias("salt"),
    )
    host = F.when(
        F.col("h") % 11 == 0, F.concat(F.lit("x"), F.col("h").cast("string"), F.lit(".example.com"))
    ).otherwise(F.concat(F.lit("h"), F.col("h").cast("string"), F.lit(".gov.si")))
    page = (F.col("id") * 13) % (n // 2 + 1)  # ~2 raw urls per target page
    raw = F.concat(
        F.lit("http://"), host, F.lit("/p"), page.cast("string"),
        F.when(F.col("noise") == 0, F.lit(".html")).otherwise(F.lit("")),
        F.when(F.col("noise") == 1, F.lit("?utm_source=x&ref=1")).otherwise(F.lit("")),
        F.when(F.col("noise") == 2, F.lit("#section")).otherwise(F.lit("")),
        F.when(F.col("noise") == 3, F.lit(".pdf")).otherwise(F.lit("")),
    )
    raw = F.when(F.col("salt") % 97 == 0, F.lit("javascript:void(0)")).otherwise(raw)
    return base.select(
        F.col("id").alias("parent_seq"),
        (F.col("id") % 40).alias("pos"),
        raw.alias("raw"),
    )


def synth_candidates_skewed(spark: SparkSession, n: int, n_hosts: int = 50_000) -> DataFrame:
    """The adversarial-skew twin of ``synth_candidates``: HALF of all
    candidate links point at ONE host (the hot-domain head the north_rule
    calls out — a gov.si portal every page links to), the rest spread as
    before. Page ids on the hot host stay diverse, so this stresses the
    host distribution, not the URL-key distribution — admission keys on
    full url (hash-uniform even for one host), which is itself the
    explicit skew design: no stage in the kernel keys on host alone."""
    base = spark.range(n).select(
        F.col("id"),
        # hot host h=1 → h1.gov.si: IN containment (h=0 would alias the
        # h%11 out-of-scope branch and the hot mass would just be filtered)
        F.when(F.col("id") % 2 == 0, F.lit(1)).otherwise(F.col("id") % n_hosts).alias("h"),
        (F.col("id") % 7).alias("noise"),
        ((F.col("id") * 2654435761) % 1000003).alias("salt"),
    )
    host = F.when(
        F.col("h") % 11 == 0, F.concat(F.lit("x"), F.col("h").cast("string"), F.lit(".example.com"))
    ).otherwise(F.concat(F.lit("h"), F.col("h").cast("string"), F.lit(".gov.si")))
    page = (F.col("id") * 13) % (n // 2 + 1)
    raw = F.concat(
        F.lit("http://"), host, F.lit("/p"), page.cast("string"),
        F.when(F.col("noise") == 0, F.lit(".html")).otherwise(F.lit("")),
        F.when(F.col("noise") == 1, F.lit("?utm_source=x&ref=1")).otherwise(F.lit("")),
        F.when(F.col("noise") == 2, F.lit("#section")).otherwise(F.lit("")),
        F.when(F.col("noise") == 3, F.lit(".pdf")).otherwise(F.lit("")),
    )
    raw = F.when(F.col("salt") % 97 == 0, F.lit("javascript:void(0)")).otherwise(raw)
    return base.select(
        F.col("id").alias("parent_seq"),
        (F.col("id") % 40).alias("pos"),
        raw.alias("raw"),
    )


def synth_texts_skewed(spark: SparkSession, n: int) -> DataFrame:
    """Adversarial content skew: the same ~25% duplicate mass as
    ``synth_texts`` but ALL duplicates share ONE text (the web's classic
    hot fp — an error/cookie page served site-wide), so the fingerprint
    groupBy sees one key carrying n/4 rows and the first-writer join sees
    an n/4-row hot side. Partial (map-side) aggregation absorbs the
    groupBy; AQE skew-join splitting covers the join — measured in
    bench.py's kernel_skew section."""
    dup = (F.col("id") % 4 == 0)
    key = F.when(dup, F.lit("0")).otherwise(F.col("id").cast("string"))
    words = F.concat_ws(
        "  ",
        F.lit("podatki  storitve"), key, F.lit("uprava register"),
        F.hex(F.xxhash64(key)), F.lit("evidenca\tpotrdilo"),
        F.hex(F.xxhash64(key, F.lit(1))),
    )
    return spark.range(n).select(F.col("id").alias("seq"), words.alias("text"))


def synth_seen(spark: SparkSession, n: int, n_hosts: int = 50_000) -> DataFrame:
    return spark.range(n).select(
        F.concat(
            F.lit("http://h"), ((F.col("id") * 7) % n_hosts).cast("string"),
            F.lit(".gov.si/p"), F.col("id").cast("string"),
        ).alias("url")
    )


def synth_texts(spark: SparkSession, n: int) -> DataFrame:
    """n page texts with ~25% duplicate groups (report main.tex:157 ratio).
    Filler 'words' come from hex(xxhash64) — deterministic and cheap (the
    earlier sha2-based generator spent more on generating the corpus than
    the dedup op under test)."""
    dup = (F.col("id") % 4 == 0)
    key = F.when(dup, (F.col("id") % 997).cast("string")).otherwise(F.col("id").cast("string"))
    words = F.concat_ws(
        "  ",
        F.lit("podatki  storitve"), key, F.lit("uprava register"),
        F.hex(F.xxhash64(key)), F.lit("evidenca\tpotrdilo"),
        F.hex(F.xxhash64(key, F.lit(1))),
    )
    return spark.range(n).select(F.col("id").alias("seq"), words.alias("text"))


def materialize_round_inputs(
    spark: SparkSession, root: str, n_candidates: int, n_seen: int, n_texts: int,
    n_files: int = 64, skewed: bool = False,
) -> str:
    """Write the synthetic round inputs as parquet once (idempotent): the
    timed kernel then reads columnar storage, as a production round does —
    candidates are the previous round's stored extraction output, the seen
    set and page texts are carried state. ``skewed=True`` writes the
    adversarial hot-host / hot-fingerprint twins (same row counts) for the
    skew-robustness measurement — use a DIFFERENT root."""
    if os.path.exists(f"{root}/_OK"):
        return root
    os.makedirs(root, exist_ok=True)
    make_cand = synth_candidates_skewed if skewed else synth_candidates
    make_texts = synth_texts_skewed if skewed else synth_texts
    make_cand(spark, n_candidates).repartition(n_files) \
        .write.mode("overwrite").parquet(f"{root}/cand")
    synth_seen(spark, n_seen).repartition(n_files) \
        .write.mode("overwrite").parquet(f"{root}/seen")
    make_texts(spark, n_texts).repartition(n_files) \
        .write.mode("overwrite").parquet(f"{root}/texts")
    with open(f"{root}/_OK", "w") as fh:
        fh.write("ok")
    return root


def admission_kernel(
    spark: SparkSession, n_candidates: int, n_seen: int, use_bloom: bool = True,
    sidecar=None, cache_registry: list | None = None,
    cand: DataFrame | None = None, seen: DataFrame | None = None,
) -> DataFrame:
    """F1-F7 + robots-prefix + in-batch aggregate + seen anti-join (J2).

    Staged projections compute each derived column (url, host, ext) ONCE
    as an output attribute; predicates then reference attributes only.
    (The previous chained-withColumn/filter form let predicate pushdown
    re-inline the whole canonicalization chain into every conjunct —
    codegen CSE cannot hoist subtrees out of conditional branches, and the
    duplicated regex work both slowed the scan 12× and capped 4→16-core
    scaling at 0.67 via allocation pressure on the shared memory bus.)
    """
    if cand is None:
        cand = synth_candidates(spark, n_candidates)
    if seen is None:
        seen = synth_seen(spark, n_seen)
    c0 = cand.filter(~is_rejected_scheme(F.col("raw"))).select(
        "parent_seq", "pos", canonicalize_url(F.col("raw")).alias("url")
    )
    c1 = c0.select(
        "parent_seq", "pos", "url",
        url_host(F.col("url")).alias("host"),
        is_binary_extension(F.col("url")).alias("binext"),
    )
    c = c1.filter(
        (F.col("url") != "")
        & F.col("host").isNotNull()
        & in_containment(F.col("host"))
        & ~F.col("binext")
        & ~F.col("url").contains("/private/")
    ).drop("binext")
    # first-occurrence per url via hash aggregate, NOT a window: partial
    # (map-side) aggregation + no sort — the scalable form of U3. The
    # ordering key (parent_seq, pos) packs into one long (pos < 64): a
    # plain min() — the min_by(struct, struct) form fails whole-stage
    # codegen compilation (InternalCompilerException → interpreted
    # fallback for the entire stage) and shuffles wider rows. host is
    # recomputed from the distinct url afterwards (cheap substring views).
    c = (
        c.select("url", (F.col("parent_seq") * 64 + F.col("pos")).alias("ord"))
        .groupBy("url")
        .agg(F.min("ord").alias("ord"))
        .select(
            "url",
            url_host(F.col("url")).alias("host"),
            F.shiftright("ord", 6).alias("parent_seq"),
            (F.col("ord") % 64).alias("pos"),
        )
    )
    if use_bloom:
        # F5 Bloom sidecar (north_rule): definite-new candidates bypass
        # the exact anti-join shuffle; possible members are confirmed
        # exactly — identical results, ~|seen ∩ cand| + FPR·|cand| join
        # input instead of |cand|. The sidecar is carried state (built
        # incrementally from seen-set deltas at commit time in the
        # engine); pass a prebuilt one to keep a one-round measurement
        # honest, else it is built here.
        from webcrawler_spark.functions.bloom import (
            anti_join_with_bloom,
            build_sharded_bloom,
        )

        if sidecar is None:
            sidecar = build_sharded_bloom(seen, "url", expected_items=n_seen, fpp=0.01)
        out = anti_join_with_bloom(c, seen, "url", sidecar, cache_registry)
        return out.select("url", "host", "parent_seq", "pos")
    return c.join(seen, "url", "left_anti").select("url", "host", "parent_seq", "pos")


def dedup_kernel(spark: SparkSession, n_texts: int,
                 texts: DataFrame | None = None) -> DataFrame:
    """J5/W2: fingerprint + first-writer-wins on whitespace-collapsed text."""
    t = synth_texts(spark, n_texts) if texts is None else texts
    norm = F.lower(collapse_ws(F.col("text")))
    f = t.select("seq", F.xxhash64(norm).alias("fp"))
    firsts = f.groupBy("fp").agg(F.min("seq").alias("first_seq"))
    return f.join(firsts, "fp").select(
        "seq", (F.col("seq") != F.col("first_seq")).alias("is_duplicate")
    )


def build_seen_sidecar(spark: SparkSession, n_seen: int,
                       path: str | None = None,
                       n_shards: int | None = None):
    """Build the sharded Bloom sidecar for synth_seen — carried state,
    maintained incrementally in the engine; built outside the timed round.
    With ``path``, a completed build there is REUSED (the carried-state
    shape: state layout is a property of the data, not of the cluster
    size probing it — the bench probes one fixed-shard sidecar at every
    parallelism level)."""
    from webcrawler_spark.functions.bloom import build_sharded_bloom

    return build_sharded_bloom(
        synth_seen(spark, n_seen), "url", path=path, n_shards=n_shards,
        expected_items=n_seen, fpp=0.01, reuse_existing=path is not None,
    )


def run_round_kernel(spark: SparkSession, n_candidates: int = 4_000_000,
                     n_seen: int = 2_000_000, n_texts: int = 1_000_000,
                     sidecar=None, use_bloom: bool = True,
                     input_root: str | None = None) -> dict:
    """One production-scale round: admission + content dedup; returns counts.

    With ``input_root`` (written by ``materialize_round_inputs``) the round
    reads its inputs from parquet — the production shape; without it the
    synthetic generators are fused into the scan (fine for tests — but note
    the fused generator+admission hashAgg method exceeds janino's 64 KB
    limit, so that one stage runs on the non-codegen fallback path; results
    are identical. Benchmarks must pass ``input_root`` so every timed AND
    warmup stage compiles, which is also the plan shape a real round has)."""
    cand = seen = texts = None
    if input_root is not None:
        cand = spark.read.parquet(f"{input_root}/cand")
        seen = spark.read.parquet(f"{input_root}/seen")
        texts = spark.read.parquet(f"{input_root}/texts")
    caches: list = []
    admitted = admission_kernel(spark, n_candidates, n_seen,
                                use_bloom=use_bloom, sidecar=sidecar,
                                cache_registry=caches, cand=cand, seen=seen)
    n_admitted = admitted.count()
    for c in caches:
        c.unpersist()
    deduped = dedup_kernel(spark, n_texts, texts=texts)
    n_dup = deduped.filter("is_duplicate").count()
    return {"n_candidates": n_candidates, "n_admitted": n_admitted,
            "n_texts": n_texts, "n_duplicates": n_dup}
