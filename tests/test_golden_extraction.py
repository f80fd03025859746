"""Golden extraction parity against the reference's committed artifacts.

The reference ships 8 golden outputs (``implementation-extraction/
data_*.json``) produced by its mode-B XPath extractor from the committed
inputs (``input-extraction/<site>/*.html``, 4 sites × 2 pages,
run-extraction.py:121-231,380-392). These tests assert:

* mode B == goldens field-for-field AND byte-for-byte through the S8
  golden JSON sink (``ensure_ascii=False, indent=4``).
* mode A (pure-Catalyst regex + J6 key-joins) matches the goldens on
  every field where the reference's two modes provably agree, and matches
  the documented mode-A/mode-B divergences elsewhere:
  - overstock ``SavingPercent`` drops the parens in mode A
    (run-extraction.py:50-56 vs :160-163);
  - mode A captures inner HTML / raw entities where mode B takes text
    nodes (rtvslo Content, mimovrste Description);
  - mode A's mimovrste Tags finditer also hits the empty
    ``<em class="label...">`` wrapper (one leading '' element);
  - ceneje mode A keys items by img ``alt`` in ``finditer`` order and
    sees the lazy-loader ``src`` (CDN URL) where XPath sees the saved
    local file — so item order and Image differ, the per-title fields
    agree.
"""

from __future__ import annotations

import json

import pytest

from webcrawler_spark.extract import golden as G


@pytest.fixture(scope="module")
def corpus(spark):
    return G.read_extraction_corpus(spark).cache()


@pytest.fixture(scope="module")
def mode_b(corpus):
    return [tuple(r) for r in G.mode_b_rows(corpus).collect()]


@pytest.fixture(scope="module")
def mode_a(corpus):
    return [tuple(r) for r in G.mode_a_rows(corpus).collect()]


def test_mode_b_matches_all_8_goldens(mode_b):
    assert sorted(mode_b) == sorted(G.golden_rows())


def test_mode_b_golden_json_bytes(mode_b, tmp_path):
    """S8: reconstruct each page's nested JSON and byte-compare with the
    committed data_<page>.json (run-extraction.py:390-392 format)."""
    from webcrawler_spark.sources.sinks import write_golden_json

    for site, pages in G.PAGES.items():
        for page in pages:
            rows = [r for r in mode_b if r[0] == site and r[1] == page]
            data = G.reconstruct(rows)
            out = tmp_path / f"data_{page}.json"
            write_golden_json(data, str(out))
            ours = out.read_bytes()
            theirs = open(f"{G.GOLDEN_DIR}/data_{page}.json", "rb").read()
            assert ours == theirs, f"byte mismatch for {page}"


def _index(rows, site):
    out = {}
    for s, p, item, field, idx, value in rows:
        if s == site:
            out[(p, item, field, idx)] = value
    return out


def test_mode_a_overstock_golden_anchored(mode_a):
    """J6 PROD_ID key-join: every overstock field equals the golden except
    SavingPercent, which mode A captures without parens."""
    a = _index(mode_a, "overstock.com")
    gold = [r for r in G.golden_rows() if r[0] == "overstock.com"]
    assert len(a) == len(gold) > 0
    for _, p, item, field, idx, gv in gold:
        av = a[(p, item, field, idx)]
        if field == "SavingPercent":
            assert f"({av})" == gv
        else:
            assert av == gv, (p, item, field)


def test_mode_a_rtvslo_golden_anchored(mode_a):
    a = _index(mode_a, "rtvslo.si")
    gold = [r for r in G.golden_rows() if r[0] == "rtvslo.si"]
    for _, p, item, field, idx, gv in gold:
        av = a[(p, item, field, idx)]
        if field == "Content":
            # regex captures inner HTML of the article body; the golden is
            # the XPath string() of a different (media-bearing) div — only
            # sanity-check substance here
            assert len(av) > 1000 and "<div" in av
        else:
            assert av == gv, (p, field)


def test_mode_a_mimovrste_golden_anchored(mode_a):
    a = {}
    tags = {}
    for s, p, item, field, idx, v in mode_a:
        if s != "mimovrste.si":
            continue
        if field == "Tags":
            tags.setdefault(p, []).append((idx, v))
        else:
            a[(p, field)] = v
    gold_tags = {}
    for s, p, item, field, idx, gv in G.golden_rows():
        if s != "mimovrste.si":
            continue
        if field == "Description":
            # mode A runs up to '<a' with raw entities; text-node golden is
            # a prefix after entity decoding
            got = a[(p, field)].replace("&nbsp;", "\xa0")
            assert got.startswith(gv[:40])
        elif field == "Tags":
            gold_tags.setdefault(p, []).append((idx, gv))
        else:
            assert a[(p, field)] == gv, (p, field)
    for p, gv in gold_tags.items():
        got = [v for _, v in sorted(tags[p])]
        want = [v for _, v in sorted(gv)]
        # finditer also matches the empty label wrapper → leading ''
        assert got[0] == "" and got[1:] == want, p


def test_mode_a_ceneje_title_keyed(mode_a):
    """ceneje items key by img alt: order and Image differ from the golden
    (lazy-loader CDN src), but per-title MinPrice/Stores/Action agree."""
    by_title = {}
    cur = {}
    for s, p, item, field, idx, v in sorted(
        r for r in mode_a if r[0] == "ceneje.si"
    ):
        cur.setdefault((p, item), {})[field] = v
    for (p, _), d in cur.items():
        by_title[(p, d["Title"])] = d
    gold_items = {}
    for s, p, item, field, idx, v in G.golden_rows():
        if s == "ceneje.si":
            gold_items.setdefault((p, item), {})[field] = v
    n_checked = 0
    for (p, _), gd in gold_items.items():
        ad = by_title.get((p, gd["Title"]))
        assert ad is not None, ("missing title", gd["Title"])
        for f in ("MinPrice", "Stores", "Action"):
            assert ad[f] == gd[f], (p, gd["Title"], f)
            n_checked += 1
    assert n_checked == 3 * 48  # 23 + 25 items


def test_mode_a_java_python_regex_parity(corpus, mode_a):
    """The Catalyst regex programs (Java regex) must agree with Python
    ``re`` on the same patterns — the reference runs CPython. Checked for
    every scalar field and repeated field of every scalar-site page."""
    import re

    htmls = {(r.site, r.page): r.html for r in corpus.collect()}
    a = {}
    rep = {}
    for s, p, item, field, idx, v in mode_a:
        if field == "Tags":
            rep.setdefault((s, p, field), []).append((idx, v))
        else:
            a[(s, p, field)] = v
    n = 0
    for site, cfg in G.MODE_A_SCALAR.items():
        for (s, p), html in htmls.items():
            if s != site:
                continue
            hc = html.replace("\n", "").replace("\t", "")
            for field, pat in cfg["fields"].items():
                m = re.search(pat, hc)
                want = "" if m is None or m.group(1) is None else m.group(1).strip()
                assert a[(s, p, field)] == want, (s, p, field)
                n += 1
            for field, pat in cfg["repeated"].items():
                want = [mm.group(1).strip() for mm in re.finditer(pat, hc)]
                got = [v for _, v in sorted(rep[(s, p, field)])]
                assert got == want, (s, p, field)
                n += 1
    assert n == 2 * 6 + 2 * 7  # rtvslo 6 fields, mimovrste 6+1 per page


# ---------------------------------------------------------------------------
# mode C (X15) over the REAL reference page pairs (run-extraction.py:337-348)
# ---------------------------------------------------------------------------

def _norm_ws(s):
    import re as _re

    return _re.sub(r"\s+", " ", s or "").strip()


# minimum golden field-value pairs the induced wrapper must re-extract per
# site. ceneje's two committed pages are DIFFERENT search queries: their
# result lists share no structure, so alignment generalizes items to
# optional subtrees rather than #TEXT wildcards (the reference's auto_ex
# produces the same optional-heavy shape there) — its floor is structural
# (optionals + wildcards present), not value recovery.
_MODE_C_MIN_RECOVERED = {
    "rtvslo.si": 1,
    "overstock.com": 30,
    "mimovrste.si": 1,
    "ceneje.si": 0,
}


@pytest.mark.parametrize("site", list(_MODE_C_MIN_RECOVERED))
def test_mode_c_real_pairs(corpus, site):
    """Induce the wrapper from each site's two committed pages; the #TEXT
    wildcards' per-page values must re-extract the golden-anchored fields
    that differ between the pages (containment after whitespace collapse —
    goldens are post-processed substrings of the raw text nodes)."""
    import sys

    from webcrawler_spark.extract.induction import induce_and_extract

    sys.setrecursionlimit(100_000)
    pages = G.PAGES[site]
    htmls = {r.page: r.html for r in corpus.collect() if r.site == site}
    h1, h2 = htmls[pages[0]], htmls[pages[1]]

    tpl, fields = induce_and_extract(h1, h2)
    assert len(tpl) > 1000
    # repetition collapse can merge identical sibling wildcards in the
    # template STRING; the captured field list keeps every instance
    assert 0 < tpl.count("#TEXT") <= len(fields)
    # self-alignment is wildcard-free (a page is its own template)
    tpl_self, fields_self = induce_and_extract(h1, h1)
    assert fields_self == []
    assert "#TEXT" not in tpl_self
    # pages with diverging structure must generalize via optional subtrees
    assert ")?" in tpl

    # golden re-extraction: for each field value pair that differs between
    # the two pages, some wildcard's (page1, page2) values contain them
    per_key: dict = {}
    for s, p, item, field, idx, v in G.golden_rows():
        if s == site:
            per_key.setdefault((item, field, idx), {})[p] = v
    f1 = [_norm_ws(a) for a, _ in fields]
    f2 = [_norm_ws(b) for _, b in fields]
    recovered = 0
    for per_page in per_key.values():
        if len(per_page) != 2:
            continue
        v1, v2 = _norm_ws(per_page.get(pages[0])), _norm_ws(per_page.get(pages[1]))
        if v1 == v2 or not v1 or not v2:
            continue
        if any(v1 in a and v2 in b for a, b in zip(f1, f2)):
            recovered += 1
    assert recovered >= _MODE_C_MIN_RECOVERED[site]
