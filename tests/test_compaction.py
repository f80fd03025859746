"""Compaction crash-recovery protocol (storage/compaction.py): each
reachable mid-crash state heals to a consistent tree with no data loss."""

from __future__ import annotations

import os

from webcrawler_spark.storage.compaction import (
    compact_parquet_dir,
    n_data_files,
    recover_compaction,
)


def _mk(p, marker):
    os.makedirs(p, exist_ok=True)
    with open(os.path.join(p, marker), "w") as f:
        f.write("x")


def test_recover_compaction_all_crash_states(tmp_path):
    root = str(tmp_path)
    # (a) crash between the two swap renames: only the old survives
    _mk(f"{root}/t_a.__compact_old", "data_a")
    # (b) crash after the swap, before old cleanup: both exist
    _mk(f"{root}/t_b", "data_b_new")
    _mk(f"{root}/t_b.__compact_old", "data_b_old")
    # (c) crash before the swap: stale tmp next to the untouched source
    _mk(f"{root}/t_c", "data_c")
    _mk(f"{root}/t_c.__compact_tmp", "data_c_partial")

    actions = recover_compaction(root)
    assert len(actions) == 3
    # (a) rolled back under the real name, data intact
    assert os.path.exists(f"{root}/t_a/data_a")
    # (b) new data kept, old removed
    assert os.path.exists(f"{root}/t_b/data_b_new")
    assert not os.path.exists(f"{root}/t_b.__compact_old")
    # (c) source kept, tmp removed
    assert os.path.exists(f"{root}/t_c/data_c")
    assert not os.path.exists(f"{root}/t_c.__compact_tmp")

    # idempotent: a second pass has nothing to do
    assert recover_compaction(root) == {}


def test_compact_parquet_dir_rolls_back_then_compacts(spark, tmp_path):
    """compact_parquet_dir on a dir whose previous compaction crashed
    mid-swap (only the .__compact_old name exists) first rolls back,
    then compacts normally — contents invariant."""
    p = str(tmp_path / "d")
    spark.range(100).write.parquet(p)
    spark.range(100, 200).write.mode("append").parquet(p)
    want = sorted(r["id"] for r in spark.read.parquet(p).collect())
    before = n_data_files(p)
    os.rename(p, p + ".__compact_old")  # simulate the mid-swap crash
    after = compact_parquet_dir(spark, p)
    assert after <= before
    assert sorted(r["id"] for r in spark.read.parquet(p).collect()) == want
