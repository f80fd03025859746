"""Perceptual-hash near-duplicate detection over the graft image table —
multimodal dedup for a training-data pipeline: two images whose 64-bit
DCT phashes differ in ≤ k bits are near-identical content (re-encodes,
quality variants, tiny crops) that a dedup pass should cluster and keep
once.

Banding with an EXACT recall guarantee (pigeonhole, not probabilistic):
split the 64-bit hash into ``bands`` contiguous slices; if two hashes
differ in at most ``max_hamming`` bits and ``max_hamming < bands``, at
least one slice is bit-identical, so an equality join on
(band_index, slice) finds EVERY qualifying pair — the verify step
(``bit_count(a XOR b) <= k``) only removes false candidates, never true
ones. This is the classic Hamming-distance blocking used for web-scale
simhash dedup (Manku, Jain, Das Sarma — WWW'07, public technique), applied
to the image phash column of the input_hint pair table.

Scale: the join shuffles (band, slice) keys — 4 rows per image, uniform
for non-pathological hash distributions; the popcount verify touches
candidates only. No all-pairs stage. Hot slices (e.g. a constant-color
logo re-used site-wide yielding one identical hash thousands of times)
are exact-dup groups, which belong to the cheaper exact path
(groupBy phash) first; AQE skew-join splitting covers the remainder.

Clustering reuses ``dedup.cluster.connected_components`` (large/small
star), electing the min image_id per cluster — the same keep-one rule as
the text families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.dedup.cluster import connected_components

BANDS = 4  # 16-bit slices; exact recall for max_hamming <= 3


def _band_key(phash, band: int, width: int):
    # arithmetic shift is fine: we mask to the slice width afterwards
    return F.shiftright(phash, band * width).bitwiseAND(F.lit((1 << width) - 1))


def phash_near_duplicates(
    imgs: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = BANDS,
) -> DataFrame:
    """Distinct (a, b, hamming), a < b, with popcount(phash_a XOR
    phash_b) <= max_hamming. Exact recall requires max_hamming < bands
    (pigeonhole — see module docstring); asserted, not assumed."""
    assert max_hamming < bands, "pigeonhole guarantee needs max_hamming < bands"
    assert 64 % bands == 0
    width = 64 // bands
    base = imgs.select(F.col(id_col).alias("id"), F.col(phash_col).alias("ph"))
    band_structs = [
        F.struct(F.lit(b).alias("band"), _band_key(F.col("ph"), b, width).alias("key"))
        for b in range(bands)
    ]
    banded = base.select(
        "id", "ph", F.explode(F.array(*band_structs)).alias("bk")
    ).select("id", "ph", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.bit_count(F.col("l.ph").bitwiseXOR(F.col("r.ph"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def phash_clusters(
    imgs: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = BANDS,
) -> DataFrame:
    """(image_id, cluster_id, cluster_size, is_canonical) for every image
    in a near-dup pair; canonical = min image_id (keep-one election).

    UNORDERED on purpose: every consumer either joins the result
    (pair_curation_flags — a sort would cost a range exchange the join
    immediately destroys) or collects it into keyed structures; callers
    that display rows should orderBy themselves."""
    pairs = phash_near_duplicates(imgs, id_col, phash_col, max_hamming, bands)
    cc = connected_components(pairs)
    sz = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sz, "component")
        .select(
            F.col("node").alias(id_col),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
    )
