"""Image+caption pair assembly — the crawl→payload integration.

north_rule: the frontier/scheduler operates "over Iceberg tables of
image + caption pairs". The two halves meet here:

* the CRAWL side discovers images and their captions: X4 extraction
  emits the ``image_captions`` delta (page_url, src, alt) —
  ``crawl/engine.py`` — where alt is the page's caption text for the
  image (simulator-equality-tested like every other delta);
* the INGEST side holds the payload bytes keyed by
  ``image_id_of_src(src)``: in production the fetcher's byte store; here
  a deterministic distributed render (``fixtures.render_image``) whose
  ground truth is recomputable from the key alone, which is what makes
  the per-row invariant testable with nothing stored.

``assemble_pairs`` joins the two into the ``input_hint`` table
``(image_id, bytes, w, h, fmt, caption, phash)``; ``verify_pairs`` checks
the per-row invariant — decoded pixels round-trip (PSNR ≥ 40 dB for the
lossy format), recomputed phash == stored phash, and EXACT caption
equality between the crawl-extracted alt and the payload's ground truth.

Scale shape: captions reduce to ONE row per src before the join
(min-alt winner-pick — hot srcs like the fixture's logo.png collapse, so
the join key is unique on both sides and skew cannot concentrate); the
join shuffles on image_id (high-cardinality, uniform by construction of
the hash key); render/verify are Arrow-batched ``mapInPandas`` — at
production scale the render stage is the fetcher and everything else is
unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAIR_SCHEMA = ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")


def caption_records(
    pages: DataFrame,
    url_col: str = "url",
    srcs_col: str = "img_srcs",
    alts_col: str = "img_alts",
) -> DataFrame:
    """X4 image src+alt extraction over a pages table: one
    (page_url, src, alt) row per non-``data:`` image. THE single
    implementation of the guarded zip — a missing alts column or a NULL
    alts value coalesces to empty strings, because ``arrays_zip(srcs,
    NULL)`` is NULL and would silently drop the row's image records; a
    SHORTER alts array pads alt with NULL (arrays_zip semantics). The
    crawl engine and the driver query both call this."""
    no_alts = F.transform(F.col(srcs_col), lambda _: F.lit(""))
    alts = (
        F.coalesce(F.col(alts_col), no_alts)
        if alts_col in pages.columns else no_alts
    )
    return (
        pages.select(
            F.col(url_col).alias("page_url"),
            F.explode(F.arrays_zip(
                F.col(srcs_col).alias("src"), alts.alias("alt")
            )).alias("ia"),
        )
        .select("page_url", F.col("ia.src").alias("src"), F.col("ia.alt").alias("alt"))
        .filter(~F.col("src").startswith("data"))
    )


def _image_id_col(src):
    # driver-side twin: fixtures.image_id_of_src (same crc32). crc32%1e9
    # keeps the key recomputable in DuckDB for the oracle; a production
    # ingest would key on xxhash64 of the fetched BYTES (64-bit content
    # hash: collisions negligible at 10^10 and byte-identical images
    # dedup for free). A key collision here is detectable, not silent:
    # the colliding row's caption_ok/phash_ok invariant fails.
    return F.concat(
        F.lit("img"),
        F.lpad(F.pmod(F.crc32(src.cast("binary")), F.lit(1_000_000_000)).cast("string"), 10, "0"),
    )


def distinct_caption_keys(captions: DataFrame) -> DataFrame:
    """(image_id, src, caption): the crawl's caption table keyed for the
    payload join — ONE row per src. Conflicting alts for the same src
    (different pages captioning one image differently) resolve to the
    minimum alt, a deterministic winner-pick, so image_id is unique and
    every downstream join is fanout-free. (The fixture's alt is a pure
    function of src, so the pick is a no-op there.)"""
    return (
        captions.groupBy("src")
        .agg(F.min("alt").alias("caption"))
        .withColumn("image_id", _image_id_col(F.col("src")))
    )


def ingest_payloads(keys: DataFrame) -> DataFrame:
    """The ingest side: render+encode every distinct image_id into the
    payload store (image_id, bytes, w, h, fmt, phash). Stands in for the
    fetcher's byte download; deterministic per key (fixtures.render_image)
    so any row is re-derivable for verification. phash is of the STORED
    artifact (decode(bytes)) — see fixtures.make_images."""
    from webcrawler_spark.functions.images import decode_image, encode_image, phash64
    from webcrawler_spark.sources.fixtures import render_image

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id in pdf["image_id"]:
                pixels, w, h, fmt, _caption = render_image(image_id)
                data = encode_image(pixels, fmt)
                ph = phash64(pixels if fmt == "png" else decode_image(data))
                rows.append((image_id, data, w, h, fmt, ph))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "phash"])

    return keys.select("image_id").distinct().mapInPandas(
        render,
        schema="image_id string, bytes binary, w int, h int, fmt string, phash long",
    )


def assemble_pairs(keys: DataFrame, payloads: DataFrame) -> DataFrame:
    """input_hint table: caption keys (``distinct_caption_keys``) ⋈
    payload store on image_id. Takes the KEYS frame (not the raw captions
    delta) so callers who already built it for ``ingest_payloads`` don't
    run the dedup aggregation twice."""
    return keys.join(payloads, "image_id", "inner").select(*PAIR_SCHEMA)


def verify_pairs(pairs: DataFrame) -> DataFrame:
    """Per-row invariant columns for an assembled pair table: shape,
    phash recompute, decode→encode→decode PSNR/exactness
    (multimodal.verify_invariants) plus caption equality against the
    ground truth recomputable from image_id (fixtures.caption_of)."""
    from webcrawler_spark.multimodal import verify_invariants
    from webcrawler_spark.sources.fixtures import caption_of

    inv = verify_invariants(pairs)

    @F.pandas_udf("boolean")
    def caption_ok(image_id: pd.Series, caption: pd.Series) -> pd.Series:
        return pd.Series(
            [caption_of(i) == c for i, c in zip(image_id, caption)])

    caps = pairs.select(
        "image_id", caption_ok(F.col("image_id"), F.col("caption")).alias("caption_ok"))
    return inv.join(caps, "image_id", "inner")
