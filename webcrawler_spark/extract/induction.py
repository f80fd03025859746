"""Mode-C wrapper induction (X15): align two pages of the same site into
an extraction template.

Reference behavior (run-extraction.py:233-348): recursive alignment of two
parsed HTML trees — matching tags recurse; text that differs between the
pages becomes a ``#TEXT`` wildcard (the extractable field!); a subtree
present in only one page becomes optional ``( … )?``; runs of identical
sibling subtrees collapse to a repetition ``( … )+``; attributes that look
like generated ids (>3 digits, run-extraction.py:262-271) are ignored when
comparing tags.

This is a pure-Python tree algorithm, embarrassingly parallel per page
pair → ``applyInPandas`` grouped by site (SURVEY.md §2.10 grouped-map).
Alignment of child lists uses difflib.SequenceMatcher over child
signatures (tag names), the classic align-then-recurse wrapper-induction
shape (RoadRunner-style, public technique).
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import DataFrame

from webcrawler_spark.extract.html_text import Node, parse_html

_MANY_DIGITS = re.compile(r"\d{4,}")


def _sig(node: Node) -> str:
    """Tag signature for matching; generated-id attrs ignored (:262-271)."""
    attrs = {k: v for k, v in sorted(node.attrs.items())
             if not (v and _MANY_DIGITS.search(str(v)))}
    if node.tag in ("a", "img"):  # href/src values vary per page — tag only
        return node.tag
    return node.tag + "".join(f"|{k}={v}" for k, v in attrs.items())


def _own_text(node: Node) -> str:
    return " ".join(t.strip() for _, t in node.text_parts if t.strip())


def _render(node: Node, body: str) -> str:
    return f"<{node.tag}>{body}</{node.tag}>"


def align(a: Node, b: Node, fields: list | None = None) -> str:
    """Template of two same-signature nodes.

    When ``fields`` is given, every ``#TEXT`` wildcard also APPENDS the
    pair of page texts it generalized — i.e. the mode-C *extraction* of
    the data fields from both input pages (the wildcard positions are
    exactly where per-page data lives; run-extraction.py:337-348 prints
    the template, the extraction is its value assignment)."""
    ta, tb = _own_text(a), _own_text(b)
    if ta == tb:
        text = ta
    else:
        text = "#TEXT"  # differing data → extractable wildcard
        if fields is not None:
            fields.append((ta, tb))

    sa = [_sig(c) for c in a.children]
    sb = [_sig(c) for c in b.children]
    sm = SequenceMatcher(a=sa, b=sb, autojunk=False)
    parts: list[str] = [text] if text else []
    for op, i1, i2, j1, j2 in sm.get_opcodes():
        if op == "equal":
            for ca, cb in zip(a.children[i1:i2], b.children[j1:j2]):
                parts.append(align(ca, cb, fields))
        elif op in ("delete", "insert"):
            src = a.children[i1:i2] if op == "delete" else b.children[j1:j2]
            for c in src:
                parts.append(f"( {align(c, c)} )?")  # optional subtree
        else:  # replace: same position, different signature → both optional
            for c in a.children[i1:i2]:
                parts.append(f"( {align(c, c)} )?")
            for c in b.children[j1:j2]:
                parts.append(f"( {align(c, c)} )?")
    # repetition collapse: runs of identical sibling templates → ( t )+
    collapsed: list[str] = []
    for p in parts:
        if collapsed and collapsed[-1] == p:
            collapsed[-1] = f"( {p} )+" if not collapsed[-1].endswith(")+") else collapsed[-1]
        elif collapsed and collapsed[-1] == f"( {p} )+":
            pass  # already collapsed
        else:
            collapsed.append(p)
    body = " ".join(x for x in collapsed if x)
    return _render(a, body) if a.tag != "#root" else body


def induce_template(html1: str, html2: str) -> str:
    """The mode-C entry: template of two pages (run-extraction.py:337-348)."""
    return align(parse_html(html1), parse_html(html2))


def induce_and_extract(html1: str, html2: str) -> tuple[str, list[tuple[str, str]]]:
    """Mode-C template + the per-page values of every #TEXT wildcard —
    the (page1_text, page2_text) pairs the template generalizes, i.e. the
    induced wrapper's extraction of both input pages."""
    fields: list[tuple[str, str]] = []
    tpl = align(parse_html(html1), parse_html(html2), fields)
    return tpl, fields


def induce_wrappers(pages: DataFrame, site_col: str = "site",
                    html_col: str = "html") -> DataFrame:
    """Per site: induce a template from the first two pages (by row order
    within the group, matching the reference's pairwise invocation)."""

    def per_site(pdf: pd.DataFrame) -> pd.DataFrame:
        site = pdf[site_col].iloc[0]
        htmls = pdf[html_col].tolist()
        if len(htmls) < 2:
            tpl = induce_template(htmls[0], htmls[0]) if htmls else ""
        else:
            tpl = induce_template(htmls[0], htmls[1])
        return pd.DataFrame({"site": [site], "template": [tpl]})

    return pages.groupBy(site_col).applyInPandas(
        per_site, schema="site string, template string"
    )
