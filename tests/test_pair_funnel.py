"""Composed pair funnel (multimodal/funnel.py): stage monotonicity,
selected ⟺ batch-plan presence, batch integrity of the final plan, and
agreement with the standalone stage operators. Value-level Spark↔DuckDB
parity of the whole composition is the driver's `pair_funnel` oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_spark.multimodal.funnel import funnel_summary, pair_funnel


def _pairs(spark, n=60):
    # deterministic metadata with repeated captions (every 4th shares a
    # group), null captions (every 7th), tiny images (every 5th fails the
    # 4096-pixel gate), and phash groups (every 3rd shares one of 4)
    rows = []
    for i in range(n):
        caption = (
            None if i % 7 == 0
            else f"stock photo {i % 4}" if i % 4 == 0
            else f"a unique caption about thing number {i} here"
        )
        w = 16 if i % 5 == 0 else 64 + (i % 9) * 16
        h = 64 + (i % 5) * 32
        phash = (0x5A5A5A5A5A5A5A5 + (i % 4 if i % 3 == 0 else i * 1009)) & ((1 << 60) - 1)
        rows.append((i, w, h, caption, phash))
    return spark.createDataFrame(
        rows, "image_id long, w int, h int, caption string, phash long"
    )


def test_stage_monotonicity_and_selected_iff_plan(spark):
    out = pair_funnel(_pairs(spark)).collect()
    n_aligned = sum(r.aligned for r in out)
    n_keep = sum(r.neardup_keep for r in out)
    n_stage2 = sum(r.aligned and r.neardup_keep for r in out)
    n_sel = sum(r.selected for r in out)
    assert n_sel <= n_stage2 <= min(n_aligned, n_keep)
    assert 0 < n_sel < len(out)  # non-vacuous both ways
    for r in out:
        has_plan = r.batch_id is not None
        assert r.selected == has_plan
        assert (r.n_dup is not None) == has_plan
        if not has_plan:
            assert r.is_full is False  # real boolean, never NULL
        if r.selected:
            assert r.aligned and r.neardup_keep and r.caption_ok and r.gate_ok


def test_caption_dedup_keeps_best_per_group(spark):
    pairs = _pairs(spark)
    meta = {r.image_id: r for r in pairs.collect()}
    out = pair_funnel(pairs).collect()
    # group the stage-2 survivors by caption text (the fingerprint's
    # preimage here — captions are already normalized in the fixture)
    groups: dict[str, list] = {}
    for r in out:
        if r.aligned and r.neardup_keep:
            groups.setdefault(meta[r.image_id].caption, []).append(r)
    saw_multi = False
    for cap, rows in groups.items():
        winners = [r for r in rows if r.selected]
        assert len(winners) == 1  # exactly one survivor per caption group
        if len(rows) > 1:
            saw_multi = True
            assert winners[0].n_dup == len(rows)
            best = max(
                rows,
                key=lambda r: (
                    meta[r.image_id].w * meta[r.image_id].h,
                    -r.image_id,
                ),
            )
            assert winners[0].image_id == best.image_id
    assert saw_multi  # the fixture genuinely exercises repeated captions


def test_batches_are_dense_and_full_flag_exact(spark):
    out = [r for r in pair_funnel(_pairs(spark, 80), batch_size=4).collect() if r.selected]
    by_batch = {}
    for r in out:
        by_batch.setdefault((r.bucket_id, r.shard, r.batch_id), []).append(r)
    for (_, _, _), rows in by_batch.items():
        slots = sorted(r.slot for r in rows)
        assert slots == list(range(len(rows)))  # dense slots from 0
        full = len(rows) == 4
        assert all(r.is_full == full for r in rows)


def test_funnel_agrees_with_standalone_stages(spark):
    from webcrawler_spark.curation import pair_curation_flags
    from webcrawler_spark.multimodal.alignment import pair_alignment

    pairs = _pairs(spark)
    out = {r.image_id: r for r in pair_funnel(pairs).collect()}
    for r in pair_alignment(pairs).collect():
        assert out[r.image_id].align_score == r.align_score
        assert out[r.image_id].aligned == r.aligned
    for r in pair_curation_flags(pairs).collect():
        assert out[r.image_id].caption_ok == r.caption_ok
        assert out[r.image_id].gate_ok == r.gate_ok
        assert out[r.image_id].neardup_keep == r.keep


def test_summary_counts(spark):
    pairs = _pairs(spark)
    s = funnel_summary(pair_funnel(pairs)).collect()[0]
    rows = pair_funnel(pairs).collect()
    assert s.n_input == len(rows)
    assert s.n_selected == sum(r.selected for r in rows)
    assert s.n_in_full_batches == sum(bool(r.is_full) for r in rows)
