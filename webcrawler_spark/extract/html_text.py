"""HTML parsing on the stdlib — visible-text extraction (X13) and an
XPath-lite evaluator (X10/X11) for mode-B extraction.

The reference uses lxml: ``Cleaner(style=True, kill_tags={nav, footer})``
+ ``body.text_content()`` for text (processing.py:32-37,
run-extraction.py:341-343) and absolute positional XPaths like
``/html/body/div[2]/table/tr[i]/td[3]`` (run-extraction.py:126-231).
lxml is not in this container, so both are rebuilt on
``html.parser.HTMLParser`` over a minimal DOM:

* ``visible_text(html)`` — concatenated text content, skipping
  script/style (Cleaner style=True) and nav/footer (kill_tags), with
  whitespace runs collapsed.
* ``xpath_string(html, path)`` — absolute path with 1-based positional
  predicates (``div[2]``), returning the string() of the first match.
* ``xpath_all(html, path)`` — all matches' string values (the repeated-
  group form that replaces the reference's tr[i] driver loop, X11).

Spark surface: Arrow-vectorized pandas UDFs built by the factory
functions; per-row Python never appears at the DataFrame level.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOID_TAGS = {"br", "img", "hr", "input", "meta", "link", "area", "base",
             "col", "embed", "source", "track", "wbr"}
KILL_TAGS = {"script", "style", "nav", "footer"}


class Node:
    __slots__ = ("tag", "attrs", "children", "text_parts")

    def __init__(self, tag: str, attrs=None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.children: list[Node] = []
        self.text_parts: list[tuple[int, str]] = []  # (child-slot, text)

    def text_content(self, kill: frozenset = frozenset()) -> str:
        if self.tag in kill:
            return ""
        out = []
        slot = 0
        child_i = 0
        # interleave text parts and children in document order
        parts = dict()
        for s, t in self.text_parts:
            parts.setdefault(s, []).append(t)
        for i in range(len(self.children) + 1):
            for t in parts.get(i, []):
                out.append(t)
            if i < len(self.children):
                out.append(self.children[i].text_content(kill))
        return "".join(out)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, attrs)
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, attrs))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        top = self.stack[-1]
        top.text_parts.append((len(top.children), data))


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html or "")
    return b.root


_WS = re.compile(r"\s+")


def visible_text(html: str) -> str:
    """X13: text content minus script/style/nav/footer, whitespace-normalized."""
    txt = parse_html(html).text_content(kill=frozenset(KILL_TAGS))
    return _WS.sub(" ", txt).strip()


_STEP = re.compile(r"^([A-Za-z0-9#*]+)(?:\[(\d+)\])?$")


def _select(node: Node, steps: list[tuple[str, int | None]]) -> list[Node]:
    cur = [node]
    for tag, idx in steps:
        nxt = []
        for n in cur:
            matches = [c for c in n.children if c.tag == tag or tag == "*"]
            if idx is not None:
                if len(matches) >= idx:
                    nxt.append(matches[idx - 1])
            else:
                nxt.extend(matches)
        cur = nxt
    return cur


def _parse_path(path: str) -> list[tuple[str, int | None]]:
    steps = []
    for part in path.strip("/").split("/"):
        m = _STEP.match(part)
        if not m:
            raise ValueError(f"unsupported XPath step: {part!r}")
        steps.append((m.group(1).lower(), int(m.group(2)) if m.group(2) else None))
    return steps


def xpath_string(html: str, path: str) -> str:
    """string() of the first node matched by an absolute positional path."""
    hits = _select(parse_html(html), _parse_path(path))
    return _WS.sub(" ", hits[0].text_content()).strip() if hits else ""


def xpath_all(html: str, path: str) -> list[str]:
    """string() of every node matched (the tr[i]-loop replacement, X11)."""
    return [_WS.sub(" ", h.text_content()).strip()
            for h in _select(parse_html(html), _parse_path(path))]


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def make_visible_text_udf():
    @F.pandas_udf(T.StringType())
    def visible_text_udf(html: pd.Series) -> pd.Series:
        return html.map(lambda h: visible_text(h or ""))

    return visible_text_udf


def make_xpath_string_udf(path: str):
    @F.pandas_udf(T.StringType())
    def xpath_string_udf(html: pd.Series) -> pd.Series:
        return html.map(lambda h: xpath_string(h or "", path))

    return xpath_string_udf


def make_xpath_all_udf(path: str):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def xpath_all_udf(html: pd.Series) -> pd.Series:
        return html.map(lambda h: xpath_all(h or "", path))

    return xpath_all_udf
