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

# HTML optional-end-tag recovery (the subset lxml/libxml2 applies that
# matters for positional XPaths over real saved pages): opening one of
# these tags implicitly closes any open tag in its set.
_AUTO_CLOSE = {
    "p": {"p"},
    "li": {"li"},
    "option": {"option"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "thead": {"tr", "td", "th", "tbody", "thead", "tfoot"},
    "tbody": {"tr", "td", "th", "tbody", "thead", "tfoot"},
    "tfoot": {"tr", "td", "th", "tbody", "thead", "tfoot"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
}
# an auto-close never propagates past one of these container tags
_AUTO_CLOSE_BARRIER = {"table", "ul", "ol", "select", "dl", "#root"}


class Node:
    __slots__ = ("tag", "attrs", "children", "text_parts")

    def __init__(self, tag: str, attrs=None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.children: list[Node] = []
        self.text_parts: list[tuple[int, str]] = []  # (child-slot, text)

    def text_nodes(self) -> list[str]:
        """Direct child text nodes in document order, merged per slot —
        the lxml ``text()`` axis (text between child elements)."""
        parts: dict[int, list[str]] = {}
        for s, t in self.text_parts:
            parts.setdefault(s, []).append(t)
        return ["".join(parts[i]) for i in sorted(parts)]

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()

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
        closes = _AUTO_CLOSE.get(tag)
        if closes:
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t in closes:
                    del self.stack[i:]
                    break
                if t in _AUTO_CLOSE_BARRIER:
                    break
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

# lxml ``Cleaner`` with default flags (the reference's indexing config,
# processing.py:32-37) additionally KILLS the form-widget tags
# (``forms=True`` → button/input/select/textarea; the <form> tag itself
# is removed but its children kept, which text-wise equals our keeping
# it). Validated against the published per-document frequencies — e.g.
# 'slovenije' lands on the report's exact 9,105 only with these killed.
INDEX_WIDGET_KILL = frozenset({"button", "input", "select", "textarea"})


def text_content_raw(
    html: str,
    body_only: bool = False,
    extra_kill: frozenset = frozenset(),
) -> str:
    """Raw concatenated text content (NO whitespace normalization) minus
    script/style/nav/footer and ``extra_kill`` tags. ``body_only``
    mirrors the reference's ``tree.body.text_content()``
    (processing.py:32-37): <head>/<title> text is excluded. The raw
    (uncollapsed) form matters for X14 parity — nltk's rule cascade
    distinguishes space from other whitespace (e.g. the "' " ending-quote
    rule), so the tokenizer must see the same bytes nltk would."""
    root = parse_html(html)
    node = root
    if body_only:
        for n in root.iter():
            if n.tag == "body":
                node = n
                break
    return node.text_content(kill=frozenset(KILL_TAGS) | extra_kill)


def visible_text(html: str) -> str:
    """X13: text content minus script/style/nav/footer, whitespace-normalized."""
    txt = text_content_raw(html)
    return _WS.sub(" ", txt).strip()


# One XPath step: optional descendant axis handled by the parser; name is
# a tag, '*', 'text()', or '@attr'; predicates are [@attr='v'] / [@attr="v"]
# and/or a positional [n], in either order.
_STEP = re.compile(
    r"^(?P<name>[A-Za-z0-9#*-]+|\*|text\(\)|@[A-Za-z0-9_:-]+)"
    r"(?P<preds>(?:\[[^\]]*\])*)$"
)
_PRED = re.compile(r"\[(?:@(?P<attr>[A-Za-z0-9_:-]+)=(?P<q>['\"])(?P<val>.*?)(?P=q)|(?P<pos>\d+))\]")


class _Step:
    __slots__ = ("name", "attr_preds", "pos", "descendant")

    def __init__(self, name, attr_preds, pos, descendant):
        self.name = name                # tag | '*' | 'text()' | '@attr'
        self.attr_preds = attr_preds    # list[(attr, value)]
        self.pos = pos                  # int | None (1-based)
        self.descendant = descendant    # True for '//' axis


def _parse_path(path: str) -> list[_Step]:
    parts = path.strip().split("/")
    # leading absolute '/': '' head; '//' produces an extra '' marking the
    # descendant axis for the following step
    steps: list[_Step] = []
    descendant = False
    for i, part in enumerate(parts):
        if part == "":
            if i > 0 or path.startswith("//"):
                descendant = True
            continue
        m = _STEP.match(part)
        if not m:
            raise ValueError(f"unsupported XPath step: {part!r}")
        name = m.group("name")
        attr_preds, pos = [], None
        for pm in _PRED.finditer(m.group("preds") or ""):
            if pm.group("pos") is not None:
                pos = int(pm.group("pos"))
            else:
                attr_preds.append((pm.group("attr"), pm.group("val")))
        if not name.startswith("@") and name != "text()":
            name = name.lower()
        steps.append(_Step(name, attr_preds, pos, descendant))
        descendant = False
    return steps


def _matches(node: Node, step: _Step) -> bool:
    if step.name != "*" and node.tag != step.name:
        return False
    return all(node.attrs.get(a) == v for a, v in step.attr_preds)


def _select(root: Node, steps: list[_Step]):
    """Evaluate; returns list of Node, or list of str if the final step is
    text() / @attr. Positional predicates are per parent context (lxml)."""
    cur: list = [root]
    for step in steps:
        nxt: list = []
        if step.name == "text()":
            for n in cur:
                texts = n.text_nodes()
                if step.pos is not None:
                    if len(texts) >= step.pos:
                        nxt.append(texts[step.pos - 1])
                else:
                    nxt.extend(texts)
        elif step.name.startswith("@"):
            a = step.name[1:]
            for n in cur:
                if a in n.attrs:
                    nxt.append(n.attrs[a] or "")
        elif step.descendant:
            # document-order descendant search; positional predicate
            # selects from the whole matched set (lxml's (//x)[n] is rare —
            # reference paths never combine // with [n], keep global)
            for n in cur:
                hits = [d for d in n.iter() if d is not n and _matches(d, step)]
                if step.pos is not None:
                    if len(hits) >= step.pos:
                        nxt.append(hits[step.pos - 1])
                else:
                    nxt.extend(hits)
        else:
            for n in cur:
                matches = [c for c in n.children if _matches(c, step)]
                if step.pos is not None:
                    if len(matches) >= step.pos:
                        nxt.append(matches[step.pos - 1])
                else:
                    nxt.extend(matches)
        cur = nxt
    return cur


def _as_string(hit) -> str:
    return hit if isinstance(hit, str) else hit.text_content()


def xpath_raw(html_or_node, path: str) -> list[str]:
    """All matches as raw strings (no whitespace normalization): text
    nodes / attribute values verbatim, element nodes as string() — the
    exact lxml ``tree.xpath(...)`` result list for the supported grammar."""
    root = html_or_node if isinstance(html_or_node, Node) else parse_html(html_or_node)
    return [_as_string(h) for h in _select(root, _parse_path(path))]


def xpath_first(html_or_node, path: str) -> str:
    """The reference's extract_x_path (run-extraction.py:115-119): first
    match, '' if none, then \\n/\\t removed and ends stripped."""
    hits = xpath_raw(html_or_node, path)
    if not hits:
        return ""
    return hits[0].replace("\n", "").replace("\t", "").lstrip().rstrip()


def xpath_string(html: str, path: str) -> str:
    """string() of the first node matched, whitespace-normalized."""
    hits = xpath_raw(html, path)
    return _WS.sub(" ", hits[0]).strip() if hits else ""


def xpath_all(html: str, path: str) -> list[str]:
    """string() of every match, whitespace-normalized (the tr[i]-loop
    replacement, X11)."""
    return [_WS.sub(" ", h).strip() for h in xpath_raw(html, path)]


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
