"""BPE merge-loop trainer + learned (fastText-shaped) quality filter.

The BPE tests pin BOTH engines' greedy-merge semantics to an independent
pure-Python implementation of Sennrich 2016's reference scan (`i+=2` on
merge), on corpora adversarial for overlap handling (aa-runs, xy-chains),
and verify the applying-the-merges property: re-running the pair count
after r merges reproduces each recorded rule's count at its turn.

The model_quality tests verify the DuckDB twin value-for-value on real
testdata and exercise the documented model seam (externally supplied
weights flip the decision), plus gate non-vacuity.
"""

from __future__ import annotations

import collections
import re

import duckdb
import pytest
from pyspark.sql.functions import col as F_col

from webcrawler_spark.functions.bpe import (
    bpe_merges, bpe_merges_duckdb, bpe_segment, bpe_segment_duckdb,
    char_vocab)
from webcrawler_spark.functions.model_quality import (
    model_quality_scores, model_quality_oracle_sql, fixture_weights)

_DUCK_TOKS = ("list_filter(regexp_split_to_array(lower(text), "
              "'[^a-z0-9]+'), t -> t <> '')")


def _py_bpe(texts: list[str], n_merges: int):
    rules, _state = _py_bpe_full(texts, n_merges)
    return rules


def _py_segment(texts: list[str], n_merges: int, k: int):
    """(word, wc, n_syms, segmented) top-k by (wc DESC, word ASC)."""
    _rules, state = _py_bpe_full(texts, n_merges)
    rows = sorted(
        (("".join(syms), c, len(syms), " ".join(syms))
         for syms, c in state.items()),
        key=lambda r: (-r[1], r[0]))
    return rows[:k]


def _py_bpe_full(texts: list[str], n_merges: int):
    """Independent reference: Counter vocab + Sennrich's greedy scan."""
    vocab = collections.Counter()
    for t in texts:
        for w in re.split("[^a-z0-9]+", t.lower()):
            if len(w) >= 2:
                vocab[w] += 1
    state = {tuple(w): c for w, c in vocab.items()}
    rules = []
    for rank in range(1, n_merges + 1):
        counts = collections.Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rules.append((rank, a, b, a + b, n))
        nxt: dict[tuple, int] = {}
        for syms, c in state.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        state = nxt
    return rules, state


CORPORA = [
    # aa-runs (x==y overlap chains) + ordinary words
    ["aaaa aaa banana bandana", "the cat sat on the mat", "abcabcabc abc"],
    # classic Sennrich example vocabulary
    ["low lower lowest newest newer new wide wider widest"] * 3,
    # pure runs and short words
    ["aaaaaaa", "aa ab ba bb aab abb", "zzzz zz z"],
    # xy-chains (x!=y, adjacent matches share no symbol)
    ["xyxyxyxy xyxy xy", "yxyxyx"],
]


@pytest.mark.parametrize("ci", range(len(CORPORA)))
def test_bpe_merges_match_python_reference(spark, ci):
    texts = CORPORA[ci]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in bpe_merges(df, n_merges=10).collect()]
    assert got == _py_bpe(texts, 10)


@pytest.mark.parametrize("ci", range(len(CORPORA)))
def test_bpe_merges_duckdb_twin_matches_python_reference(ci):
    texts = CORPORA[ci]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"('{t}')" for t in texts) + ") t(text)")
    got = [tuple(r)
           for r in con.execute(bpe_merges_duckdb(_DUCK_TOKS, "documents",
                                                  10)).fetchall()]
    assert got == _py_bpe(texts, 10)


def test_bpe_merges_on_testdata_vs_oracle(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [tuple(r) for r in bpe_merges(df, n_merges=6).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = [tuple(r) for r in
            con.execute(bpe_merges_duckdb(_DUCK_TOKS, "documents",
                                          6)).fetchall()]
    assert got == want
    assert len(got) == 6
    # counts are non-increasing is NOT guaranteed by BPE (merging can
    # create a more frequent pair), but every count must be positive and
    # every rule distinct
    assert all(n > 0 for *_x, n in got)
    assert len({(a, b) for _r, a, b, _m, _n in got}) == 6


def test_bpe_property_applying_merges_reproduces_counts(spark):
    """Property from the round brief: apply the learned rules back to the
    corpus vocab and check each rule's recorded count equals the count of
    its pair at its turn (i.e. the loop's own pair-count at round r)."""
    texts = CORPORA[1]
    rules = _py_bpe(texts, 8)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    vocab = {tuple(r["syms"]): r["wc"] for r in char_vocab(df).collect()}
    for rank, a, b, _m, n in rules:
        counts = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        assert counts[(a, b)] == n, (rank, a, b)
        assert max(counts.values()) == n
        nxt: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        vocab = nxt


@pytest.mark.parametrize("ci", range(len(CORPORA)))
def test_bpe_segment_matches_python_reference(spark, ci):
    texts = CORPORA[ci]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in bpe_segment(df, n_merges=6, k=50).collect()]
    assert got == _py_segment(texts, 6, 50)


def test_bpe_segment_duckdb_twin_and_exhaustion():
    """Segment twin on a corpus whose pairs run out BEFORE n_merges: the
    oracle's v{n} must pass the final vocab through empty-best rounds
    unchanged (LEFT JOIN path), matching the Spark loop's early break."""
    texts = ["ab ab cd", "ab"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"('{t}')" for t in texts) + ") t(text)")
    got = [tuple(r) for r in con.execute(
        bpe_segment_duckdb(_DUCK_TOKS, "documents", 10, 50)).fetchall()]
    assert got == _py_segment(texts, 10, 50)
    # every word fully merged to one symbol; rules ran out at 2
    assert all(n == 1 for _w, _c, n, _s in got)
    rules = con.execute(
        bpe_merges_duckdb(_DUCK_TOKS, "documents", 10)).fetchall()
    assert len(rules) == 2


def test_bpe_segment_spark_exhaustion(spark):
    texts = ["ab ab cd", "ab"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in bpe_segment(df, n_merges=10, k=50).collect()]
    assert got == _py_segment(texts, 10, 50)


def test_bpe_segment_on_testdata_vs_oracle(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [tuple(r) for r in bpe_segment(df, n_merges=6, k=40).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = [tuple(r) for r in con.execute(
        bpe_segment_duckdb(_DUCK_TOKS, "documents", 6, 40)).fetchall()]
    assert got == want
    # sf0.001's synthetic corpus draws from a small word list; the vocab
    # itself may be under k
    assert len(got) >= 20
    # segmentations reassemble to their words
    for word, _wc, n, seg in got:
        assert seg.replace(" ", "") == word
        assert len(seg.split(" ")) == n


def test_model_quality_matches_duckdb_twin(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = model_quality_scores(df).orderBy("doc_id").collect()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(model_quality_oracle_sql()).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["doc_id"], g["n_feats"], g["keep_model"]) == (
            w[0], w[1], w[3])
        if g["logit"] is None:
            assert w[2] is None
        else:
            assert abs(g["logit"] - w[2]) == 0.0
    # non-vacuous: the fixture model must split the corpus both ways
    keeps = [g["keep_model"] for g in got]
    assert any(keeps) and not all(keeps)


def test_model_quality_seam_accepts_external_weights(spark):
    """The documented model seam: supplying trained weights changes the
    decision; the plumbing (hashing, broadcast join, gate) is unchanged."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string")
    # all-positive weights -> everything kept
    pos = fixture_weights(spark).withColumn("w", 0 * F_col("w") + 1.0)
    got = {r["doc_id"]: r["keep_model"]
           for r in model_quality_scores(df, weights=pos).collect()}
    assert got == {1: True, 2: True}
    # all-negative weights -> everything dropped
    neg = fixture_weights(spark).withColumn("w", 0 * F_col("w") - 1.0)
    got = {r["doc_id"]: r["keep_model"]
           for r in model_quality_scores(df, weights=neg).collect()}
    assert got == {1: False, 2: False}
    # and the logit is exactly the supplied weight mean + bias
    row = model_quality_scores(df, weights=pos, bias=0.25).collect()[0]
    assert row["logit"] == 1.25
