"""S7 real-corpus indexing: the reference's 1,416-page ``input-indexing/``
corpus through scan → clean → tokenize → postings, asserting against the
reference's own published artifacts
(implementation-indexing/report/main.tex:96-118 and the result
screenshots report/*.png, transcribed below).

Round-3 parity (faithful nltk-rule tokenizer + lxml-Cleaner-equivalent
extraction, ``functions/nltk_tokenize.py`` / ``extract/html_text.py``):

* 54/54 per-document query frequencies from the six published result
  screenshots — exact (test_published_per_document_frequencies)
* every legible published snippet window — byte-exact
  (test_published_snippet_windows_* — ~60 six-token windows of the
  filtered token stream, covering tokenizer, extraction, stopword set
  and position indexing jointly)
* global max-frequency word 'slovenije' = 9,105 — exact
* max single-document posting 'proizvodnja' = 2,266 on evem.gov.si — exact
* vocabulary 48,398 vs published 48,081 (+0.66%): the reference's
  runtime stopword set includes ``nltk.corpus.stopwords.words("slovene")``
  (stopwords.py:4), a data file absent here; its members were recovered
  from the published snippet windows where possible
  (``stopwords_sl.NLTK_SLOVENE_EVIDENCED``) and the unrecoverable tail
  is this delta.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.index import real_corpus as RC

# --- ground truth transcribed from implementation-indexing/report/*.png ---

# (query, doc) -> summed frequency, every legible row of all six screenshots
PUBLISHED_FREQUENCIES = {
    **{("robot", f"e-uprava.gov.si/e-uprava.gov.si.{i}.html"): 1
       for i in (1, 10, 11, 12, 13, 14, 15, 16, 17, 18)},
    ("social services", "e-uprava.gov.si/e-uprava.gov.si.45.html"): 5,
    ("social services", "e-uprava.gov.si/e-uprava.gov.si.9.html"): 5,
    ("social services", "evem.gov.si/evem.gov.si.661.html"): 1,
    ("social services", "podatki.gov.si/podatki.gov.si.340.html"): 1,
    ("davčna olajšava", "evem.gov.si/evem.gov.si.77.html"): 7,
    ("davčna olajšava", "evem.gov.si/evem.gov.si.646.html"): 3,
    ("davčna olajšava", "evem.gov.si/evem.gov.si.7.html"): 3,
    ("davčna olajšava", "evem.gov.si/evem.gov.si.72.html"): 3,
    ("davčna olajšava", "evem.gov.si/evem.gov.si.398.html"): 2,
    ("davčna olajšava", "evem.gov.si/evem.gov.si.404.html"): 2,
    ("davčna olajšava", "evem.gov.si/evem.gov.si.656.html"): 2,
    ("davčna olajšava", "evem.gov.si/evem.gov.si.8.html"): 2,
    ("davčna olajšava", "evem.gov.si/evem.gov.si.9.html"): 2,
    ("davčna olajšava", "podatki.gov.si/podatki.gov.si.134.html"): 2,
    ("trgovina", "evem.gov.si/evem.gov.si.371.html"): 364,
    ("trgovina", "evem.gov.si/evem.gov.si.651.html"): 94,
    ("trgovina", "evem.gov.si/evem.gov.si.21.html"): 92,
    ("trgovina", "podatki.gov.si/podatki.gov.si.340.html"): 82,
    ("trgovina", "evem.gov.si/evem.gov.si.623.html"): 12,
    ("trgovina", "evem.gov.si/evem.gov.si.329.html"): 11,
    ("trgovina", "evem.gov.si/evem.gov.si.630.html"): 11,
    ("trgovina", "evem.gov.si/evem.gov.si.320.html"): 9,
    ("trgovina", "evem.gov.si/evem.gov.si.327.html"): 9,
    ("trgovina", "evem.gov.si/evem.gov.si.622.html"): 9,
    ("podatki", "e-prostor.gov.si/e-prostor.gov.si.57.html"): 27,
    ("podatki", "e-prostor.gov.si/e-prostor.gov.si.170.html"): 25,
    ("podatki", "e-prostor.gov.si/e-prostor.gov.si.7.html"): 25,
    ("podatki", "podatki.gov.si/podatki.gov.si.437.html"): 15,
    ("podatki", "podatki.gov.si/podatki.gov.si.184.html"): 14,
    ("podatki", "podatki.gov.si/podatki.gov.si.230.html"): 14,
    ("podatki", "podatki.gov.si/podatki.gov.si.265.html"): 14,
    ("podatki", "podatki.gov.si/podatki.gov.si.277.html"): 14,
    ("podatki", "podatki.gov.si/podatki.gov.si.280.html"): 14,
    ("podatki", "podatki.gov.si/podatki.gov.si.283.html"): 14,
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.371.html"): 1287,
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.377.html"): 74,
    ("predelovalne dejavnosti", "podatki.gov.si/podatki.gov.si.340.html"): 40,
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.452.html"): 36,
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.653.html"): 30,
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.398.html"): 28,
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.72.html"): 28,
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.442.html"): 20,
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.28.html"): 17,
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.460.html"): 15,
}

# (query, doc) -> the screenshot's snippet string: per query term in
# order, that term's positions ascending, window tokens[i-3:i+3] of the
# STOPWORD-FILTERED stream, ' '-joined, windows ' ... '-joined, first 5
# windows shown (the report: "cut to ... maximum of 5 snippets").
PUBLISHED_SNIPPETS = {
    ("robot", "e-uprava.gov.si/e-uprava.gov.si.1.html"):
        "podrobnosti prosimo izpolnite robot aktualno novice",
    ("robot", "e-uprava.gov.si/e-uprava.gov.si.15.html"):
        "otroka prosimo izpolnite robot aktualno novice",
    ("robot", "e-uprava.gov.si/e-uprava.gov.si.16.html"):
        "slovenije prosimo izpolnite robot aktualno novice",
    ("robot", "e-uprava.gov.si/e-uprava.gov.si.17.html"):
        "podatke prosimo izpolnite robot aktualno novice",
    ("robot", "e-uprava.gov.si/e-uprava.gov.si.18.html"):
        "postopkih prosimo izpolnite robot aktualno novice",
    ("social services", "e-uprava.gov.si/e-uprava.gov.si.45.html"):
        "culture labour retirement social services health ... employment "
        "relationship etc social services health ... can obtain financial "
        "social assistance how ... labour retirement social services health "
        "death ... relationship etc social services health death",
    ("social services", "evem.gov.si/evem.gov.si.661.html"):
        "records and related services ajpes and",
    ("social services", "podatki.gov.si/podatki.gov.si.340.html"):
        "recreation and spa services ltd terme",
    ("davčna olajšava", "evem.gov.si/evem.gov.si.77.html"):
        "podlagi normiranih odhodkov davčna obveznost prihodki ... izračun "
        "davčne obveznosti davčna obveznost ugotavlja ... ugotavlja podlagi "
        "lestvice davčna obveznost 49700 ... davčna obveznost 49700 davčna "
        "obveznost znaša ... 20 davčne osnove davčna osnova 23200",
    ("davčna olajšava", "evem.gov.si/evem.gov.si.7.html"):
        "39 50 20 davčna osnova ugotavlja ... davčni register dodeljena "
        "davčna številka davčna ... dodeljena davčna številka davčna "
        "številka identifikacijska",
    ("davčna olajšava", "evem.gov.si/evem.gov.si.646.html"):
        "razliko kapitalskih družb davčna obveznost družbenike ... "
        "dejanskega izplačila dobička davčna obveznost družbenike ... naslov "
        "pravne osebe davčna številka tuje",
    ("davčna olajšava", "evem.gov.si/evem.gov.si.72.html"):
        "prihodkov dejanskih odhodkov davčna osnova dobiček ... prihodkov "
        "normiranih odhodkov davčna osnova ugotovi ... davčnem letu "
        "ugotavlja davčna osnova zavezancu",
    ("davčna olajšava", "evem.gov.si/evem.gov.si.398.html"):
        "ddv računu navedena davčna številka davčnega ... naslov matična "
        "številka davčna številka dejavnosti",
    ("davčna olajšava", "evem.gov.si/evem.gov.si.404.html"):
        "pomeni status normiranca davčna osnova dohodka ... davčnem letu "
        "ugotavlja davčna osnova zavezancu",
    ("davčna olajšava", "evem.gov.si/evem.gov.si.656.html"):
        "storitve navedbo obrnjena davčna obveznost primeru ... navesti "
        "klavzulo obrnjena davčna obveznost poenostavljeni",
    ("davčna olajšava", "evem.gov.si/evem.gov.si.8.html"):
        "davčni register dodeljena davčna številka davčna ... dodeljena "
        "davčna številka davčna številka identifikacijska",
    ("davčna olajšava", "evem.gov.si/evem.gov.si.9.html"):
        "davčnem letu ugotavlja davčna osnova zavezancu ... stroški davčne "
        "olajšave davčna izguba priznajo",
    ("davčna olajšava", "podatki.gov.si/podatki.gov.si.134.html"):
        "ime ime priimek davčna številka rojstva ... ime priimek emšo "
        "davčna številka spol",
    ("trgovina", "evem.gov.si/evem.gov.si.371.html"):
        "organizacij gl 46110 trgovina debelo kmetijskimi ... juh gl 10890 "
        "trgovina debelo mesnimi ... ipd gl 10890 trgovina debelo "
        "pripravljenimi ... jedmi gl 46380 trgovina drobno pripravljenimi "
        "... skladiščenje nevarnih kemikalij trgovina debelo nevarnimi",
    ("trgovina", "evem.gov.si/evem.gov.si.651.html"):
        "trgu dozimetrija govedoreja trgovina drobno specializiranih ... "
        "drobno specializiranih prodajalnah trgovina drobno "
        "nespecializiranih ... drobno nespecializiranih prodajalnah "
        "trgovina drobno specializiranih ... specializiranih prodajalnah "
        "živili trgovina drobno prodajaln ... nepremičninsko posredovanje "
        "nespecializirana trgovina debelo nespecializirana",
    ("trgovina", "evem.gov.si/evem.gov.si.21.html"):
        "sklad prijava evempodročja trgovina našli informacije ... razvija "
        "seznam dejavnosti trgovina drobno nespecializiranih ... drobno "
        "nespecializiranih prodajalnah trgovina drobno prodajaln ... tržnic "
        "47990 nespecializirana trgovina debelo trgovina ... "
        "nespecializirana trgovina debelo trgovina drobno stojnicah",
    ("trgovina", "podatki.gov.si/podatki.gov.si.340.html"):
        "storitve doo dent trgovina storitve doo ... doo adria investicije "
        "trgovina posredništvo storitve ... storitve doo ahatservis "
        "trgovina storitve doo ... vzdrževanje doo alba trgovina "
        "proizvodnja doo ... almaja proizvodnja storitve trgovina doo alma",
    ("trgovina", "evem.gov.si/evem.gov.si.623.html"):
        "izdelki široke porabe trgovina debelo izdelki ... široke porabe "
        "spada trgovina debelo lesenimi ... plutovinastimi izdelki ipd "
        "trgovina debelo kolesi ... kolesi deli zanja trgovina debelo "
        "pisarniškimi ... potrebščinami knjigami časopisi trgovina debelo "
        "usnjenimi",
    ("trgovina", "evem.gov.si/evem.gov.si.329.html"):
        "materialom sanitarno opremo trgovina debelo lesom ... sanitarno "
        "opremo spada trgovina debelo neobdelanim ... debelo neobdelanim "
        "lesom trgovina debelo proizvodi ... primarne obdelave lesa "
        "trgovina debelo premaznimi ... sredstvi laki barvami trgovina "
        "debelo tapetami",
    ("trgovina", "evem.gov.si/evem.gov.si.630.html"):
        "nerazvrščenimi predmeti gospodinjstvo trgovina drobno "
        "specializiranih ... gospodinjstvo spada specializirana trgovina "
        "drobno pohištvom ... drobno pohištvom specializirana trgovina "
        "drobno svetili ... opremo razsvetljavo specializirana trgovina "
        "drobno gospodinjsko ... porcelana keramike specializirana "
        "trgovina drobno izdelki",
    ("trgovina", "evem.gov.si/evem.gov.si.320.html"):
        "materialom napravami ogrevanje trgovina debelo kovinskimi ... "
        "napravami ogrevanje spada trgovina debelo kovinskimi ... "
        "kovinskimi izdelki ključavnicami trgovina debelo izdelki ... "
        "debelo izdelki pritrjevanje trgovina debelo parnimi ... debelo "
        "parnimi kotli trgovina debelo sanitarno",
    ("trgovina", "evem.gov.si/evem.gov.si.327.html"):
        "debelo napravami opremo trgovina debelo napravami ... napravami "
        "opremo spada trgovina debelo transportno ... motornih koles koles "
        "trgovina debelo industrijskimi ... debelo industrijskimi roboti "
        "trgovina debelo žico ... opremo industrijsko rabo trgovina debelo "
        "električnimi",
    ("podatki", "e-prostor.gov.si/e-prostor.gov.si.57.html"):
        "občin zavihkom brezplačni podatki našli povezavo ... povezavo "
        "aplikacijo egeodetski podatki egp pomočjo ... dostopne geodetske "
        "podatke podatki občinah dostop ... nalog izobraževalnega procesa "
        "podatki brezplačni podatke ... dostopni zavihka brezplačni "
        "podatki potrebno izpolniti",
    ("podatki", "e-prostor.gov.si/e-prostor.gov.si.170.html"):
        "podatke zemljiškega katastra podatki lastnikih podatke ... podatke "
        "katastra stavb podatki upravljavcih lastnikih ... inpodatke "
        "registra nepremičnin podatki upravljavcih lastnikihvsi ... "
        "upravljavcih lastnikihvsi ostali podatki geodetskih evidenc ... "
        "podatkovstruktura veljavnost podatkov podatki geodetske uprave",
    ("podatki", "podatki.gov.si/podatki.gov.si.437.html"):
        "povezava seznam novosti podatki katalog ijz ... oceno 3 povezani "
        "podatki vsebujejo uri ... npr rdf povezljivi podatki vsebujejo "
        "naslove ... npr rdf strukturirani podatki odprtem formatu ... npr "
        "csv strukturirani podatki lastniškem formatu",
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.371.html"):
        "vir ministrstvo infrastrukturo predelovalne dejavnosti 10 ... "
        "tehnologijo 32 raznovrstne predelovalne dejavnosti 32110 ... "
        "32990 drugje nerazvrščene predelovalne dejavnosti spada ... "
        "ustrezne postavke področja predelovalne dejavnosti predelava ... "
        "iskanje ustrezne šifre dejavnosti storitve informacij",
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.452.html"):
        "prijava evemdejavnostidruge storitvene dejavnosti drugje "
        "nerazvrščene ... nerazvrščene 96090 storitvene dejavnosti drugje "
        "nerazvrščene ... skd šifra zajema dejavnosti storitve predpisani "
        "... pogoji začetek opravljanje dejavnosti predpisi pogoji ... "
        "razvoj tehnologijo lista dejavnosti običajno opravljajo",
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.377.html"):
        "straže defektolog zdravstveni dejavnosti dekan direktor ... "
        "detektiv dietetik zdravstveni dejavnosti dimnikar diplomirana ... "
        "laboratorijski sodelavec zdravstveni dejavnosti laboratorijski "
        "sodelavec ... laboratorijski sodelavec zdravstveni dejavnosti "
        "laboratorijski tehnik ... kuhar logoped zdravstveni dejavnosti "
        "magister farmacije",
    ("predelovalne dejavnosti", "podatki.gov.si/podatki.gov.si.340.html"):
        "kalan nosilec dopolnilne dejavnosti kmetiji bregar ... šport "
        "center interesnih dejavnosti ptuj center ... center šolskih "
        "obšolskih dejavnosti center urbane ... dentiko zobozdravstvene "
        "zdravstvene dejavnosti doo dentim ... derma san zdravstvene "
        "dejavnosti prodaja storitve",
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.72.html"):
        "evemvodenje podjetjadavkidavek dohodka dejavnosti davek dohodka "
        "... dejavnosti davek dohodka dejavnosti začnete opravljati ... "
        "zavezanec davek dohodka dejavnosti dohodek dejavnosti ... dohodka "
        "dejavnosti dohodek dejavnosti šteje dohodek ... neodvisnim "
        "samostojnim opravljanjem dejavnosti glede namen",
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.398.html"):
        "aktivnostmi usmerjene opravljanje dejavnosti npr pripravljalna ... "
        "nabavah namene opravljanja dejavnosti ipd obdobju ... 12 mesecev "
        "opravljanjem dejavnosti sloveniji presegli ... 11000 uporabljali "
        "opravljanje dejavnosti identificirati namene ... nabavah namene "
        "opravljanja dejavnosti ipd vloga",
    ("predelovalne dejavnosti", "evem.gov.si/evem.gov.si.28.html"):
        "zavodov opravljanje gospodarske dejavnosti lastnosti zasebnega ... "
        "pravne osebe posamezne dejavnosti posamezne vrste ... zadoščajo "
        "ustanovitev opravljanje dejavnosti zavoda ime ... dobiček "
        "opravljanja nepridobitne dejavnosti obdavči slabosti ... "
        "zasebnega zavoda število dejavnosti ustanovi zavod",
}


def _reference_snippets(tokens: list[str], query: str) -> str:
    """The reference's snippet assembly (run-sqlite-search.py:24-44 +
    processing.py:123-134): positions grouped by query term in order,
    tokens[i-3:i+3] windows, report display cut to the first 5."""
    idxs = []
    for t in query.split(" "):
        idxs.extend(i for i, w in enumerate(tokens) if w == t)
    wins = [" ".join(tokens[max(0, i - 3):i + 3]) for i in idxs]
    return " ... ".join(wins[:5])


@pytest.fixture(scope="module")
def postings(spark):
    corpus = RC.read_index_corpus(spark)
    p = RC.build_real_postings(corpus).cache()
    p.count()
    yield p
    p.unpersist()


def test_corpus_scan_counts(spark):
    corpus = RC.read_index_corpus(spark)
    per_site = dict(
        (r["site"], r["n"])
        for r in corpus.select(F.split("doc", "/").getItem(0).alias("site"))
        .groupBy("site").agg(F.count("*").alias("n")).collect()
    )
    # 146+59+650+561 = 1,416 html files (SURVEY §5)
    assert per_site == {
        "e-prostor.gov.si": 146,
        "e-uprava.gov.si": 59,
        "evem.gov.si": 650,
        "podatki.gov.si": 561,
    }


def test_headline_aggregates(postings):
    stats = RC.corpus_stats(postings).collect()[0]
    assert stats["top_word"] == "slovenije"   # published report/main.tex:98
    assert stats["top_total"] == 9105         # published — EXACT
    assert stats["n_tokens"] == 629078
    # published 48,081: the +317 is the unrecovered nltk-slovene stopword
    # tail (see module docstring); every other published figure is exact
    assert stats["vocabulary"] == 48398


def test_max_single_document_posting(postings):
    top = postings.orderBy(F.desc("frequency"), "word").limit(1).collect()[0]
    # published report/main.tex:97 — EXACT
    assert top["word"] == "proizvodnja"
    assert top["doc"] == "evem.gov.si/evem.gov.si.371.html"
    assert top["frequency"] == 2266


def test_published_per_document_frequencies(postings):
    """All 54 (query, doc, frequency) rows legible in the six published
    result screenshots, through the full Spark pipeline."""
    terms = sorted({t for q, _ in PUBLISHED_FREQUENCIES for t in q.split(" ")})
    rows = (
        postings.filter(F.col("word").isin(terms))
        .select("word", "doc", "frequency").collect()
    )
    freq = {(r["word"], r["doc"]): r["frequency"] for r in rows}
    for (query, doc), want in PUBLISHED_FREQUENCIES.items():
        got = sum(freq.get((t, doc), 0) for t in query.split(" "))
        assert got == want, (query, doc, want, got)


def test_published_snippet_windows_python(spark):
    """Every transcribed snippet string, byte-exact, via the pure-Python
    twin of the UDF (same ``reference_tokens`` the Spark path executes):
    validates tokenizer + extraction + stopword set + position indexing
    against ~60 published six-token windows."""
    from webcrawler_spark.extract.html_text import (INDEX_WIDGET_KILL,
                                                    text_content_raw)
    from webcrawler_spark.functions.nltk_tokenize import reference_tokens
    from webcrawler_spark.functions.stopwords_sl import STOPWORDS_SL_RUNTIME

    docs = sorted({d for _, d in PUBLISHED_SNIPPETS})
    toks = {}
    for doc in docs:
        site, fn = doc.split("/")
        with open(f"{RC.INDEX_ROOT}/{site}/{fn}", encoding="utf-8",
                  errors="replace") as f:
            html = RC._XML_DECL.sub("", f.read())
        text = text_content_raw(html, body_only=True,
                                extra_kill=INDEX_WIDGET_KILL)
        toks[doc] = reference_tokens(text, STOPWORDS_SL_RUNTIME)
    for (query, doc), want in PUBLISHED_SNIPPETS.items():
        got = _reference_snippets(toks[doc], query)
        assert got == want, (query, doc, want, got)


def test_published_snippet_windows_spark(postings, spark):
    """The same published windows through the Spark W3 path (search →
    snippets over the postings' positions), multi-term queries included
    — ``positions_by_term=True`` reproduces the reference's per-term
    window order."""
    from webcrawler_spark.functions.nltk_tokenize import tokens_nltk
    from webcrawler_spark.functions.stopwords_sl import STOPWORDS_SL_RUNTIME
    from webcrawler_spark.index.search import search, snippets

    corpus = RC.read_index_corpus(spark)
    for query in ("robot", "trgovina", "podatki", "davčna olajšava",
                  "social services", "predelovalne dejavnosti"):
        expect = {d: s for (q, d), s in PUBLISHED_SNIPPETS.items() if q == query}
        hits = search(spark, postings, query, positions_by_term=True).filter(
            F.col("doc").isin(list(expect)))
        got = {
            r["doc"]: " ... ".join(r["snippet"].split(" ... ")[:5])
            for r in snippets(
                corpus, hits, doc_col="doc", text_col="text",
                stopwords=tuple(sorted(STOPWORDS_SL_RUNTIME)),
                tokenizer=tokens_nltk,
            ).collect()
        }
        assert got == expect, query


def test_per_site_top_words(postings):
    tops = {r["site"]: (r["top_word"], r["top_total"])
            for r in RC.per_site_top_words(postings).collect()}
    assert tops["podatki.gov.si"] == ("slovenije", 7749)
    assert tops["evem.gov.si"] == ("dejavnosti", 4183)
    assert set(tops) == set(RC.INDEX_SITES)


def test_positions_are_dense_filtered_indices(postings):
    """Positions index the *stopword-filtered* token stream
    (processing.py:101-116): per doc, the union of all positions is
    exactly 0..n_tokens-1."""
    check = (
        postings.groupBy("doc")
        .agg(
            F.sum("frequency").alias("n"),
            F.max(F.array_max("positions")).alias("mx"),
            F.min(F.array_min("positions")).alias("mn"),
            F.sum(F.size("positions")).alias("npos"),
        )
        .filter(
            (F.col("npos") != F.col("n"))
            | (F.col("mx") != F.col("n") - 1)
            | (F.col("mn") != 0)
        )
    )
    assert check.count() == 0


def test_search_benchmark_queries(postings, spark):
    """§3.3 search over the real corpus — the report's own benchmark
    queries (implementation-indexing/report/main.tex:105-118) return
    ranked results; 'podatki' ranks a podatki.gov.si page first... and
    the top-1 scores now equal the published per-doc frequencies."""
    from webcrawler_spark.index.search import search

    for q in ["predelovalne dejavnosti", "trgovina", "social services",
              "robot", "davčna olajšava", "podatki"]:
        res = search(spark, postings, q).limit(5).collect()
        assert len(res) > 0, q
        scores = [r["score"] for r in res]
        assert scores == sorted(scores, reverse=True), q
    top = search(spark, postings, "trgovina").limit(1).collect()[0]
    assert (top["doc"], top["score"]) == ("evem.gov.si/evem.gov.si.371.html", 364)


def test_search_snippets_real_corpus(postings, spark):
    """W3 snippets over the real corpus: every snippet window of a
    single-term query contains the term (positions index the filtered
    token stream, so the hit itself is inside each ±3 window)."""
    from webcrawler_spark.functions.nltk_tokenize import tokens_nltk
    from webcrawler_spark.functions.stopwords_sl import STOPWORDS_SL_RUNTIME
    from webcrawler_spark.index.search import search, snippets

    corpus = RC.read_index_corpus(spark)
    hits = search(spark, postings, "slovenije").limit(3)
    snips = snippets(
        corpus, hits, doc_col="doc", text_col="text",
        stopwords=tuple(sorted(STOPWORDS_SL_RUNTIME)), tokenizer=tokens_nltk,
    ).collect()
    assert len(snips) == 3
    for r in snips:
        assert "slovenije" in r["snippet"]
