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


# ---------------------------------------------------------------------------
# trained model (train_quality_model): the closed seam
# ---------------------------------------------------------------------------

def _planted_corpus(spark, n: int = 64):
    """Half the docs carry planted 'spam' marker tokens (label 0), half a
    clean vocabulary (label 1) — linearly separable by hashed unigrams."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, f"zzspam{i % 5} qqjunk{i % 3} vvnoise buy "
                            f"now zzspam{i % 5} cheap deal", 0))
        else:
            rows.append((i, f"alpha{i % 5} ocean river mountain "
                            f"forest meadow stone{i % 3} valley", 1))
    df = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], "doc_id long, text string")
    labels = spark.createDataFrame(
        [(d, y) for d, _, y in rows], "doc_id long, y int")
    return df, labels


def test_train_quality_model_separates_planted_labels(spark):
    from webcrawler_spark.functions.model_quality import train_quality_model

    df, labels = _planted_corpus(spark)
    weights, bias = train_quality_model(
        df, labels, n_buckets=64, n_rounds=8, lr=0.25)
    scored = model_quality_scores(df, weights=weights, bias=bias)
    got = {r["doc_id"]: r["keep_model"] for r in scored.collect()}
    want = {d: bool(y) for d, y in labels.collect()}
    acc = sum(got[d] == want[d] for d in want) / len(want)
    # linearly separable planted signal: the trainer must do (much)
    # better than the 50% base rate — near-perfect in practice
    assert acc >= 0.95, f"trained accuracy {acc}"
    # and the artifact is a real trained vector, not the fixture LCG
    wvals = {r["fb"]: r["w"] for r in weights.collect()}
    assert any(v != 0.0 for v in wvals.values())


def test_train_quality_model_matches_duckdb_training_twin(spark, sf_dir):
    """The WHOLE training loop (not just scoring) is engine-portable:
    train in Spark on gate-derived weak labels, replay the unrolled CTE
    chain in DuckDB, compare every score bit-for-bit."""
    import __spark_entry__ as entrymod
    from webcrawler_spark.functions import gopher as G
    from webcrawler_spark.functions import lm as L
    from webcrawler_spark.functions.model_quality import (
        trained_quality_oracle_sql)
    from webcrawler_spark.sources import pages as P

    got = entrymod._q_model_quality_trained(spark, sf_dir).collect()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    labels_cte = f"""
        SELECT d.doc_id,
               CASE WHEN g.keep_gopher AND l.keep_lm THEN 1 ELSE 0 END AS y
        FROM documents d
        JOIN (SELECT page_id, keep_gopher FROM (
            {G.gopher_oracle_sql(P.synthetic_pages_duckdb())}
        )) g ON g.page_id = d.doc_id % {P.N_PAGES}
        JOIN (SELECT doc_id, keep_lm FROM (
            {L.unigram_scores_oracle_sql('SELECT doc_id, text FROM documents')}
        )) l ON l.doc_id = d.doc_id
    """
    want = con.execute(trained_quality_oracle_sql(labels_cte)).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["doc_id"], g["n_feats"], g["keep_model"]) == (
            w[0], w[1], w[3])
        if g["logit"] is None:
            assert w[2] is None
        else:
            assert abs(g["logit"] - w[2]) == 0.0


def test_train_quality_model_guards(spark):
    from webcrawler_spark.functions.model_quality import train_quality_model

    df, labels = _planted_corpus(spark, n=4)
    with pytest.raises(ValueError, match="aggregate-sized"):
        train_quality_model(df, labels, n_buckets=8192)
    empty = labels.filter(F_col("doc_id") < 0)
    with pytest.raises(ValueError, match="no labeled docs"):
        train_quality_model(df, empty, n_rounds=1)


# ---------------------------------------------------------------------------
# corpus-level encode (bpe_encode)
# ---------------------------------------------------------------------------

def _py_encode(texts: list[str], n_merges: int, first_k: int):
    """Independent reference encode: learn rules via the pure-Python
    trainer, re-apply them per word with the Sennrich scan, rank symbols
    lexicographically, encode each doc in token order."""
    rules = _py_bpe(texts, n_merges)

    def seg(word):
        syms = list(word)
        for _rank, a, b, _ab, _n in rules:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    doc_words = [
        [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        for t in texts
    ]
    segs = {w: seg(w) for ws in doc_words for w in ws}
    symtab = {s: i + 1
              for i, s in enumerate(sorted({y for v in segs.values()
                                            for y in v}))}
    out = []
    for d, ws in enumerate(doc_words):
        ids = [symtab[s] for w in ws for s in segs[w]]
        out.append((d, len(ws), len(ids),
                    " ".join(str(i) for i in ids[:first_k])))
    return out


@pytest.mark.parametrize("ci", range(len(CORPORA)))
def test_bpe_encode_matches_python_reference(spark, ci):
    from webcrawler_spark.functions.bpe import bpe_encode

    texts = CORPORA[ci]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [(r["doc_id"], r["n_words"], r["n_tokens_bpe"], r["first_ids"])
           for r in bpe_encode(df, n_merges=5, first_k=6)
           .orderBy("doc_id").collect()]
    assert got == _py_encode(texts, 5, 6)


def test_bpe_encode_conservation_and_oracle(spark, sf_dir):
    """Conservation: summed segment lengths equal summed word lengths per
    doc (no symbol lost or invented by the vocab join), and the DuckDB
    twin matches value-for-value."""
    from pyspark.sql import functions as F
    from webcrawler_spark.functions.bpe import (
        _train, bpe_encode, bpe_encode_duckdb)
    from webcrawler_spark.functions.text import tokens

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = bpe_encode(df, n_merges=6, first_k=8).orderBy("doc_id").collect()
    # conservation (per word, hence per doc): concat(syms) == word
    _rules, vocab, caches = _train(df, "text", 6)
    bad = vocab.filter(
        F.concat_ws("", "syms") != F.col("word")).count()
    for c in caches:
        c.unpersist()
    assert bad == 0
    # n_tokens_bpe between n_words (all fully merged) and total chars
    chars = {r["doc_id"]: r["nc"] for r in df.select(
        "doc_id",
        F.aggregate(tokens(F.col("text")), F.lit(0),
                    lambda a, t: a + F.length(t)).alias("nc")).collect()}
    for r in got:
        assert r["n_words"] <= r["n_tokens_bpe"] <= chars[r["doc_id"]]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(
        bpe_encode_duckdb(_DUCK_TOKS, "documents", n_merges=6,
                          first_k=8)).fetchall()
    assert [(r["doc_id"], r["n_words"], r["n_tokens_bpe"], r["first_ids"])
            for r in got] == [tuple(w) for w in want]
