"""Tests for the round-3 training-pipeline text operators: Gopher-style
quality gating, C4-style cross-corpus line dedup, GPT-3-style eval-set
decontamination, and the deterministic multi-line page generator they run
over. Each operator is checked against an independent brute-force Python
recompute (the driver separately checks the DuckDB twins)."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from webcrawler_spark.dedup.decontaminate import NGRAM_N, decontaminate
from webcrawler_spark.dedup.lines import line_dedup
from webcrawler_spark.functions.gopher import (
    MAX_DUP_LINE_FRAC,
    MAX_TOP_BIGRAM_FRAC,
    gopher_signals,
)
from webcrawler_spark.functions.text import STOPWORDS_EN
from webcrawler_spark.sources.pages import (
    FOOTER,
    HEADER,
    N_PAGES,
    N_SITES,
    NAV_PREFIX,
    SPAM_LINE,
    synthetic_pages,
)


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


# ---------------------------------------------------------------- pages


def test_synthetic_pages_structure(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    rows = {r.page_id: r for r in synthetic_pages(docs).collect()}
    n_docs = docs.count()
    assert set(rows) == set(range(min(N_PAGES, n_docs)))
    for pid, r in rows.items():
        assert r.site == pid % N_SITES
        assert r.lines[0] == HEADER
        assert r.lines[1] == f"{NAV_PREFIX}{pid % N_SITES}"
        assert r.lines[-1] == FOOTER
    # spam decoration lands exactly on doc_id % 8 == 7 member lines
    spam_docs = [r.doc_id for r in docs.filter(F.col("doc_id") % 8 == 7).collect()]
    for d in spam_docs:
        assert SPAM_LINE in rows[d % N_PAGES].lines
    # deterministic: a second evaluation yields identical rows
    again = {r.page_id: r for r in synthetic_pages(docs).collect()}
    assert {p: r.lines for p, r in rows.items()} == {p: r.lines for p, r in again.items()}


# ---------------------------------------------------------------- gopher


def _brute_gopher(lines: list[str]) -> dict:
    tok = _tok(" ".join(lines))
    nl = len(lines)
    bigrams = [" ".join(tok[i : i + 2]) for i in range(len(tok) - 1)]
    top_cnt = max(Counter(bigrams).values()) if bigrams else 0
    return {
        "n_lines": nl,
        "n_words": len(tok),
        "mean_word_len": round(sum(map(len, tok)) / len(tok), 6),
        "frac_alpha_words": round(
            sum(1 for t in tok if re.search("[a-z]", t)) / len(tok), 6
        ),
        "n_stopword_hits": sum(1 for t in tok if t in STOPWORDS_EN),
        "frac_bullet_lines": round(sum(1 for l in lines if l.startswith("- ")) / nl, 6),
        "frac_ellipsis_lines": round(sum(1 for l in lines if l.endswith("...")) / nl, 6),
        "dup_line_frac": round(1.0 - len(set(lines)) / nl, 6),
        "top_bigram_frac": round(top_cnt / (len(tok) - 1), 6) if len(tok) > 1 else 0.0,
    }


def test_gopher_signals_match_brute_force(spark):
    good = [
        "the quick brown fox jumps over the lazy dog and then it runs home",
        "a different line with many common english words that we all know well",
        "- one bullet item is fine here",
        "yet more ordinary prose text to pad the word count past the gate",
        "and a final sentence with the usual mix of words of normal length",
    ] * 2  # *2 → dup_line_frac = 0.5 > gate on 'dupey', but split below
    dupey = good  # 10 lines, 5 distinct → dup_line_frac 0.5 → dropped
    clean = good[:5] + [
        "second half keeps every line unique so the dup gate passes today",
        "words continue to flow in this entirely normal looking document here",
        "the total word count needs to clear fifty which it now does easily",
    ]
    spam = [SPAM_LINE] * 12 + ["the and of to a in is it you that was for on are"]
    pages = spark.createDataFrame(
        [(0, clean), (1, dupey), (2, spam)], "page_id int, lines array<string>"
    )
    got = {r.page_id: r.asDict() for r in gopher_signals(pages).collect()}
    for pid, lines in [(0, clean), (1, dupey), (2, spam)]:
        exp = _brute_gopher(lines)
        for k, v in exp.items():
            assert got[pid][k] == v, (pid, k, got[pid][k], v)
    assert got[0]["keep_gopher"] is True
    assert got[1]["keep_gopher"] is False  # dup_line gate
    assert got[1]["dup_line_frac"] > MAX_DUP_LINE_FRAC
    assert got[2]["keep_gopher"] is False  # repetition gates
    assert got[2]["top_bigram_frac"] > MAX_TOP_BIGRAM_FRAC


def test_gopher_non_vacuous_on_synthetic_pages(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    flags = [r.keep_gopher for r in gopher_signals(synthetic_pages(docs)).collect()]
    assert any(flags)
    # the spam decoration needs several member lines per page to trip the
    # repetition gates, so the mixed-flag guarantee holds from ~500 docs up
    if docs.count() >= 500:
        assert not all(flags)


# ------------------------------------------------------------- line dedup


def test_line_dedup_strips_cross_page_boilerplate(spark):
    pages = spark.createDataFrame(
        [
            (0, ["shared header", "alpha", "beta", "shared footer"]),
            (1, ["shared header", "gamma", "twice", "shared footer"]),
            (2, ["shared header", "twice", "delta", "shared footer"]),
            (3, ["unique only", "epsilon"]),
        ],
        "page_id int, lines array<string>",
    )
    got = {r.page_id: r for r in line_dedup(pages, min_pages=3).collect()}
    # header/footer on 3 pages → boilerplate; 'twice' on 2 pages → kept
    assert got[0].clean_text == "alpha\nbeta"
    assert got[1].clean_text == "gamma\ntwice"
    assert got[2].clean_text == "twice\ndelta"
    assert got[3].clean_text == "unique only\nepsilon"
    assert [got[p].n_removed for p in range(4)] == [2, 2, 2, 0]
    assert [got[p].n_lines for p in range(4)] == [4, 4, 4, 2]


def test_line_dedup_empty_page_after_strip(spark):
    pages = spark.createDataFrame(
        [(i, ["all boiler"]) for i in range(3)], "page_id int, lines array<string>"
    )
    got = line_dedup(pages, min_pages=3).collect()
    assert all(r.clean_text == "" and r.n_removed == 1 for r in got)


def test_line_dedup_preserves_order_on_synthetic_pages(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    pages = synthetic_pages(docs)
    raw = {r.page_id: r.lines for r in pages.collect()}
    got = {r.page_id: r for r in line_dedup(pages).collect()}
    # brute force: which line texts recur on >= 3 distinct pages?
    per_line_pages: dict[str, set[int]] = {}
    for pid, lines in raw.items():
        for l in set(lines):
            per_line_pages.setdefault(l, set()).add(pid)
    boiler = {l for l, ps in per_line_pages.items() if len(ps) >= 3}
    for pid, lines in raw.items():
        expect = [l for l in lines if l not in boiler]
        assert got[pid].clean_text == "\n".join(expect)
        assert got[pid].n_removed == len(lines) - len(expect)
        assert got[pid].n_removed >= 3  # header+nav+footer always stripped


# ---------------------------------------------------------- decontaminate


def _grams(text: str, n: int) -> set[str]:
    t = _tok(text)
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def test_decontaminate_matches_brute_force(spark):
    eval_rows = [
        (0, "which planet is known as the red planet in our solar system"),
        (1, "the mitochondria is the powerhouse of the cell as everyone knows"),
    ]
    corpus_rows = [
        # contains an exact 8-gram from eval doc 0 (wrapped in noise)
        (10, "noise before which planet is known as the red planet after noise"),
        # contains 8-grams from BOTH eval docs
        (11, "the mitochondria is the powerhouse of the cell and also "
             "planet is known as the red planet in our galaxy"),
        # shares only shorter overlaps → clean
        (12, "the red planet is mars as everyone knows from school"),
        (13, "totally unrelated text about fishing boats and river banks"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    got = {r.doc_id: r for r in decontaminate(corpus, ev).collect()}

    eval_grams = set().union(*(_grams(t, NGRAM_N) for _, t in eval_rows))
    for did, text in corpus_rows:
        shared = _grams(text, NGRAM_N) & eval_grams
        assert got[did].n_shared_ngrams == len(shared), (did, shared)
        assert got[did].contaminated is (len(shared) > 0)
    assert got[10].contaminated and got[11].contaminated
    assert not got[12].contaminated and not got[13].contaminated
    assert got[11].n_shared_ngrams > got[10].n_shared_ngrams


def test_pii_redaction_matches_brute_force(spark):
    from webcrawler_spark.functions.pii import (
        EMAIL_RE,
        EMAIL_TOKEN,
        IP_TOKEN,
        IPV4_RE,
        PHONE_RE,
        PHONE_TOKEN,
        redact_pii,
    )

    rows = [
        (0, "mail me at john.doe+spam@sub.example.com or jane_x%y@a-b.org thanks"),
        (1, "call +38612345678 or maybe +12125551234 but not 12345"),
        (2, "server 192.168.1.254 and 10.0.0.1 replied; version 1.2 did not"),
        (3, "a@b.c is too short a tld, +123456 too short a phone, 1.2.3 no ip"),
        (4, "mixed: root@example.io from 172.16.254.3 dialed +4915112345678"),
        (5, "nothing sensitive here at all"),
    ]
    got = {r.doc_id: r for r in redact_pii(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    for did, text in rows:
        clean = re.sub(EMAIL_RE, EMAIL_TOKEN, text)
        clean = re.sub(PHONE_RE, PHONE_TOKEN, clean)
        clean = re.sub(IPV4_RE, IP_TOKEN, clean)
        assert got[did].clean == clean, (did, got[did].clean, clean)
        assert got[did].n_emails == len(re.findall(EMAIL_RE, text))
        assert got[did].n_phones == len(re.findall(PHONE_RE, text))
        assert got[did].n_ips == len(re.findall(IPV4_RE, text))
    assert got[4].n_emails == got[4].n_phones == got[4].n_ips == 1
    assert got[5].clean == rows[5][1]
    # near-misses stay untouched: 1-char tld, 6-digit phone, 3-octet "ip"
    assert got[3].n_emails == 0 and got[3].n_phones == 0 and got[3].n_ips == 0
    assert got[3].clean == rows[3][1]


def test_lm_quality_matches_brute_force(spark):
    import math

    from webcrawler_spark.functions.lm import unigram_scores

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
        (2, "zyzzyva qwerty the"),
        (3, ""),
    ]
    got = {r.doc_id: r for r in unigram_scores(
        spark.createDataFrame(rows, "doc_id long, text string"),
        min_avg_logprob=-2.0).collect()}
    all_tok = [t for _, txt in rows for t in _tok(txt)]
    n = len(all_tok)
    cnt = Counter(all_tok)
    for did, txt in rows:
        tok = _tok(txt)
        assert got[did].n_tokens == len(tok)
        if not tok:
            assert got[did].avg_logprob is None and got[did].keep_lm is False
            continue
        exp = round(
            sum(round(math.log(cnt[t] / n), 6) for t in tok) / len(tok), 6
        )
        assert abs(got[did].avg_logprob - exp) < 2e-6, (did, got[did].avg_logprob, exp)
        assert got[did].keep_lm is (got[did].avg_logprob >= -2.0)
    # rare-token doc scores strictly lower than the common-token docs
    assert got[2].avg_logprob < got[0].avg_logprob
    assert got[2].avg_logprob < got[1].avg_logprob
    # and the gate separates them at the chosen threshold
    assert got[0].keep_lm and got[1].keep_lm and not got[2].keep_lm


def test_decontaminate_every_corpus_doc_reported(spark):
    corpus = spark.createDataFrame(
        [(i, f"document number {i} with some filler words") for i in range(20)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(0, "nothing matches this")], "doc_id long, text string")
    out = decontaminate(corpus, ev).collect()
    assert sorted(r.doc_id for r in out) == list(range(20))
    assert all(r.n_shared_ngrams == 0 and not r.contaminated for r in out)


def test_dsir_weights_match_brute_force(spark):
    """DSIR importance weights == a pure-Python mirror of the spec:
    hashed unigram+bigram features, Laplace-smoothed target/raw unigram
    models, 6-dp-rounded per-bucket log-ratio before the per-doc mean."""
    import hashlib
    import math

    from webcrawler_spark.functions.dsir import dsir_weights

    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox sleeps under the old tree", "en"),
        (2, "le renard brun rapide saute par dessus le chien", "fr"),
        (3, "der schnelle braune fuchs springt ueber den hund", "de"),
        (4, "", "en"),
        (5, "fox fox fox", "fr"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r.doc_id: (r.n_feats, r.avg_logratio, r.keep_dsir)
        for r in dsir_weights(
            df.select("doc_id", "text"),
            df.filter("lang = 'en'").select("doc_id", "text"),
            n_buckets=64,
        ).collect()
    }

    B = 64

    def feats(s):
        t = [x for x in re.split(r"[^a-z0-9]+", s.lower()) if x]
        fs = t + [a + " " + b for a, b in zip(t, t[1:])]
        return [int(hashlib.md5(x.encode()).hexdigest()[:15], 16) % B for x in fs]

    cr, ct = Counter(), Counter()
    for _, text, lang in rows:
        cr.update(feats(text))
        if lang == "en":
            ct.update(feats(text))
    nr, nt = sum(cr.values()), sum(ct.values())
    for doc_id, text, _ in rows:
        fs = feats(text)
        if not fs:
            assert got[doc_id] == (0, None, False)
            continue
        lrs = [
            round(
                math.log(
                    ((ct[f] + 1.0) / (nt + B)) / ((cr[f] + 1.0) / (nr + B))
                ),
                6,
            )
            for f in fs
        ]
        want = round(sum(lrs) / len(lrs), 6)
        n, w, keep = got[doc_id]
        assert n == len(fs)
        assert abs(w - want) < 1e-9, (doc_id, w, want)
        assert keep == (w >= 0.0)
    # target-language docs score above the non-target ones
    assert got[0][1] > got[2][1] and got[1][1] > got[3][1]


def test_dsir_non_vacuous_on_documents(spark, sf_dir):
    from webcrawler_spark.functions.dsir import dsir_weights

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dsir_weights(
        d.select("doc_id", "text"),
        d.filter("lang = 'en'").select("doc_id", "text"),
    ).cache()
    n = out.count()
    kept = out.filter("keep_dsir").count()
    assert 0 < kept < n
    # the kept slice is enriched in the target language
    en_rate_kept = (
        out.join(d.select("doc_id", "lang"), "doc_id")
        .filter("keep_dsir")
        .filter("lang = 'en'")
        .count()
        / kept
    )
    en_rate_all = d.filter("lang = 'en'").count() / n
    assert en_rate_kept > en_rate_all


# ---------------------------------------------------------------- repetition


def _brute_repetition(lines: list[str]) -> dict:
    """Driver-side twin of repetition_signals over one page."""
    import re
    from collections import Counter

    from webcrawler_spark.functions.repetition import (
        DUP_NS,
        MAX_DUP_LINE_CHAR_FRAC,
        MAX_DUP_NGRAM_CHAR_FRAC,
        MAX_TOP_NGRAM_CHAR_FRAC,
        TOP_NS,
    )
    from webcrawler_spark.functions.text import TOKEN_SPLIT_RE

    tok = [t for t in re.split(TOKEN_SPLIT_RE, " ".join(lines).lower()) if t]
    text_chars = sum(map(len, tok)) + max(len(tok) - 1, 0)
    out = {}
    for n in (*TOP_NS, *DUP_NS):
        grams = [" ".join(tok[i : i + n]) for i in range(max(len(tok) - n + 1, 0))]
        cnt = Counter(grams)
        if n in TOP_NS:
            # ties: max count first, then longer gram — the packed-long rule
            top = max(cnt.items(), key=lambda kv: (kv[1], len(kv[0])), default=None)
            mass = top[1] * len(top[0]) if top else 0
            out[f"top_{n}gram_char_frac"] = round(mass / text_chars, 6)
        else:
            dup = sum((c - 1) * len(g) for g, c in cnt.items() if c > 1)
            out[f"dup_{n}gram_char_frac"] = round(dup / text_chars, 6)
    line_chars = sum(map(len, lines)) + max(len(lines) - 1, 0)
    dup_mass = sum(
        (lines.count(l) - 1) * len(l) for l in dict.fromkeys(lines)
    )
    out["dup_line_char_frac"] = round(dup_mass / line_chars, 6)
    keep = out["dup_line_char_frac"] <= MAX_DUP_LINE_CHAR_FRAC
    for n in TOP_NS:
        keep = keep and out[f"top_{n}gram_char_frac"] <= MAX_TOP_NGRAM_CHAR_FRAC[n]
    for n in DUP_NS:
        keep = keep and out[f"dup_{n}gram_char_frac"] <= MAX_DUP_NGRAM_CHAR_FRAC[n]
    out["keep_repetition"] = keep
    return out


def test_repetition_signals_match_brute_force(spark):
    from webcrawler_spark.functions.repetition import repetition_signals

    clean = [
        "the quick brown fox jumps over the lazy dog and then it runs home",
        "a different line with many common english words that we all know well",
        "yet more ordinary prose text to pad the word count past the gate",
        "and a final sentence with the usual mix of words of normal length",
    ]
    loopy = [
        "one two three four five six seven eight nine ten one two three four "
        "five six seven eight nine ten one two three four five six seven "
        "eight nine ten and a little extra tail to vary things"
    ]
    dup_lines = clean[:2] * 4
    pages = spark.createDataFrame(
        [(0, clean), (1, loopy), (2, dup_lines)],
        "page_id int, lines array<string>",
    )
    got = {r.page_id: r.asDict() for r in repetition_signals(pages).collect()}
    for pid, lines in ((0, clean), (1, loopy), (2, dup_lines)):
        exp = _brute_repetition(lines)
        g = {k: v for k, v in got[pid].items() if k != "page_id"}
        assert g == exp, (pid, g, exp)
    assert got[0]["keep_repetition"] is True
    assert got[1]["keep_repetition"] is False  # dup n-gram gates fire
    assert got[1]["dup_10gram_char_frac"] > 0
    assert got[2]["keep_repetition"] is False  # dup-line char gate fires


# --------------------------------------------------------------- collocations


def test_collocations_match_brute_force(spark):
    import re
    from collections import Counter

    from webcrawler_spark.functions.collocations import collocations
    from webcrawler_spark.functions.text import TOKEN_SPLIT_RE

    docs = [
        "new york is a big city and new york never sleeps at night",
        "machine learning and machine learning again machine learning wins",
        "the cat sat on the mat while the dog sat on the rug",
        "new york new york the city of machine learning startups",
    ] * 3
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = [(r.w1, r.w2, r.c_pair, r.lift) for r in collocations(df, min_count=3, k=40).collect()]

    toks = [[t for t in re.split(TOKEN_SPLIT_RE, d.lower()) if t] for d in docs]
    uni = Counter(w for ts in toks for w in ts)
    n_uni = sum(uni.values())
    bi = Counter((ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1))
    scored = [
        (w1, w2, c, round(c * n_uni / (uni[w1] * uni[w2]), 6))
        for (w1, w2), c in bi.items()
        if c >= 3
    ]
    want = sorted(scored, key=lambda x: (-x[3], x[0], x[1]))[:40]
    assert got == want
    # the known multi-word expressions survive min_count and are scored
    # (lift favors rarer pairs, so they need not top a toy corpus)
    pairs = {(a, b) for a, b, _, _ in got}
    assert {("new", "york"), ("machine", "learning")} <= pairs
    # and they outrank a frequent-but-loosely-bound pair ("the cat":
    # 'the' appears everywhere, diluting its lift)
    ranks = {(a, b): i for i, (a, b, _, _) in enumerate(got)}
    assert ranks[("machine", "learning")] < ranks[("the", "cat")]


def test_bpe_pair_counts_closed_form(spark):
    # 'aaa' x3 -> pair 'aa' at 2 positions, 6 occurrences;
    # 'ab' x2 + 'abc' -> 'ab' at 2 positions (two distinct words), 3 occ;
    # 'abc' also yields 'bc' (1 pos, 1 occ); single chars contribute nothing
    from webcrawler_spark.functions.bpe import bpe_pair_counts

    df = spark.createDataFrame(
        [(0, "aaa aaa"), (1, "aaa ab"), (2, "ab abc x")],
        "doc_id long, text string",
    )
    got = {r["pair"]: (r["n_positions"], r["n_occurrences"])
           for r in bpe_pair_counts(df).collect()}
    assert got == {"aa": (2, 6), "ab": (2, 3), "bc": (1, 1)}
