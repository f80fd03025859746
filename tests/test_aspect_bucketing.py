"""Aspect-ratio bucketed batch packing (multimodal/bucketing.py).

Invariants, each checked against a brute-force Python twin over a
deterministic synthetic pair table:

* assignment optimality — no bucket in the menu is strictly closer (in
  the documented |w/h - bw/bh| metric) than the chosen one, and ties
  break to the smaller bucket_id;
* batch shape — within every (bucket_id, shard): slots are a dense
  0..B-1 cycle under image_id order, every batch flagged is_full has
  exactly batch_size rows, and at most ONE ragged batch exists (the
  maximal batch_id);
* determinism — re-running over a reshuffled input yields the identical
  plan row-set (the plan is a pure function of the input set);
* coverage — the synthetic w/h spread actually populates several
  buckets and both is_full polarities, so none of the above is vacuous.
"""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.multimodal.bucketing import (
    ASPECT_BUCKETS,
    aspect_bucket_batches,
)

B, SHARDS = 8, 4


@pytest.fixture(scope="module")
def pair_meta(spark):
    # same shape family as the driver's _synth_pair_meta: w in 32..128,
    # h in 32..84 -> ratios 0.38..4.0, straddling the whole bucket menu
    return spark.range(0, 700).select(
        F.col("id").alias("image_id"),
        (F.lit(32) + F.col("id") % 97).cast("int").alias("w"),
        (F.lit(32) + F.col("id") % 53).cast("int").alias("h"),
    )


@pytest.fixture(scope="module")
def plan(spark, pair_meta):
    return (
        aspect_bucket_batches(pair_meta, batch_size=B, shards=SHARDS)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )


def _best_bucket(w: int, h: int) -> tuple[int, int, int]:
    # exact-rational twin of the argmin (Fraction avoids trusting floats
    # in the oracle itself; the engine's IEEE dist orders identically
    # because ties-in-double imply ties-in-rational for these magnitudes)
    return min(
        ASPECT_BUCKETS,
        key=lambda b: (abs(Fraction(w, h) - Fraction(b[1], b[2])), b[0]),
    )


def test_assignment_is_nearest_bucket(plan):
    seen_buckets = set()
    for row in plan.itertuples():
        w = 32 + int(row.image_id) % 97
        h = 32 + int(row.image_id) % 53
        bid, bw, bh = _best_bucket(w, h)
        assert (row.bucket_id, row.bucket_w, row.bucket_h) == (bid, bw, bh)
        seen_buckets.add(row.bucket_id)
    assert len(seen_buckets) >= 4  # non-vacuous spread


def test_batches_are_dense_and_at_most_one_ragged(plan):
    full_seen = ragged_seen = 0
    for (_, _), grp in plan.groupby(["bucket_id", "shard"]):
        grp = grp.sort_values("image_id").reset_index(drop=True)
        # dense slot cycle under image_id order
        assert list(grp.batch_id) == [i // B for i in range(len(grp))]
        assert list(grp.slot) == [i % B for i in range(len(grp))]
        sizes = grp.groupby("batch_id").size()
        ragged = sizes[sizes != B]
        assert len(ragged) <= 1
        if len(ragged):
            assert ragged.index[0] == sizes.index.max()
        for bid_, sz in sizes.items():
            flags = set(grp[grp.batch_id == bid_].is_full)
            assert flags == {sz == B}
            full_seen += sz == B
            ragged_seen += sz != B
    assert full_seen and ragged_seen  # both polarities exercised


def test_plan_is_pure_function_of_input_set(spark, pair_meta, plan):
    again = (
        aspect_bucket_batches(
            pair_meta.orderBy(F.reverse(F.col("image_id").cast("string"))),
            batch_size=B,
            shards=SHARDS,
        )
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert again.equals(plan)


def test_resize_plan_covers_and_centers(spark, pair_meta):
    from webcrawler_spark.multimodal.bucketing import resize_plan

    for r in resize_plan(pair_meta).collect():
        # cover: resized dims fully contain the bucket (no letterboxing)
        assert r.resized_w >= r.bucket_w and r.resized_h >= r.bucket_h
        # one axis matches the bucket up to rounding (the scaling axis)
        assert min(r.resized_w - r.bucket_w, r.resized_h - r.bucket_h) <= 1
        # aspect preserved up to rounding: resized_w/resized_h ~ w/h
        assert abs(r.resized_w * r.h - r.resized_h * r.w) <= max(r.w, r.h)
        # crop is centered and the crop window fits
        assert 0 <= r.crop_x <= r.resized_w - r.bucket_w
        assert 0 <= r.crop_y <= r.resized_h - r.bucket_h
        assert abs((r.resized_w - r.bucket_w) - 2 * r.crop_x) <= 1
        assert abs((r.resized_h - r.bucket_h) - 2 * r.crop_y) <= 1


def test_assignment_property_random_dims(spark):
    # exact-rational argmin vs the engine's IEEE argmin over adversarial
    # dims (tiny, huge, extreme ratios) — one Spark job for the batch
    from hypothesis import given, settings, strategies as st

    cases = []

    @settings(max_examples=200, deadline=None)
    @given(st.integers(1, 20000), st.integers(1, 20000))
    def collect(w, h):
        cases.append((len(cases), w, h))

    collect()
    from webcrawler_spark.multimodal.bucketing import aspect_bucket_struct

    df = spark.createDataFrame(cases, "image_id long, w int, h int").select(
        "image_id", "w", "h", aspect_bucket_struct(F.col("w"), F.col("h")).alias("b")
    )
    for r in df.collect():
        bid, bw, bh = _best_bucket(r.w, r.h)
        assert (r.b.bucket_id, r.b.bucket_w, r.b.bucket_h) == (bid, bw, bh), (r.w, r.h)


# ---------------------------------------------------------------------------
# NaViT-style native-aspect patch packing
# ---------------------------------------------------------------------------

def test_patch_pack_invariants(spark):
    from webcrawler_spark.multimodal.bucketing import patch_pack

    rows = [
        (i, 16 + (i * 37) % 200, 16 + (i * 53) % 160) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "image_id long, w int, h int")
    budget = 60
    out = patch_pack(df, patch=16, token_budget=budget, shards=3).toPandas()
    assert len(out) == 120
    # token count is the native patch grid
    for r in out.itertuples():
        assert r.n_tokens == -(-r.w // 16) * -(-r.h // 16)
        assert r.fits == (r.n_tokens <= budget)
    nofit = out[~out.fits]
    assert len(nofit) > 0  # non-vacuous gate
    assert nofit.seq_id.isna().all() and (~nofit.is_overflow).all()
    fit = out[out.fits]
    for _, grp in fit.groupby("shard"):
        grp = grp.sort_values("image_id").reset_index(drop=True)
        # recompute the contiguous-fill rule: an image lands where its
        # exclusive token prefix starts
        prefix = grp.n_tokens.cumsum() - grp.n_tokens
        assert (grp.seq_id == prefix // budget).all()
        assert (grp.seq_offset == prefix - grp.seq_id * budget).all()
        assert (grp.is_overflow == (grp.seq_offset + grp.n_tokens > budget)).all()
        # a sequence overflows by at most one image's tokens
        per = grp.groupby("seq_id").n_tokens.sum()
        assert (per < budget + grp.n_tokens.max()).all()
        # every image in exactly one sequence: token conservation
        assert per.sum() == grp.n_tokens.sum()
