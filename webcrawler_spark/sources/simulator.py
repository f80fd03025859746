"""Reference-semantics crawl simulator — the golden oracle.

A single-threaded Python re-statement of the reference crawler's dequeue
rule (WebCrawler.java:152-202), admission predicate (:391-414), politeness
reservation (:182-185), redirect chase (:346-358), content dedup
(:230-250) and image recording (:300-309), run on a *logical clock*
(SURVEY.md §5: the reference's own ordering is wall-clock/thread-
nondeterministic, so "matching the reference's crawl ordering" is defined
against this serialization).

No code is shared with the Spark engine except the pure canonicalization
helpers (which both sides must agree on by construction) — the engine is
validated by comparing its outputs against this independently-written
loop.

Semantics decisions (documented deviations, each quantized to the logical
clock):
* the 1 s sleep-and-rescan (:195-201) becomes "advance the clock one tick";
  all crawl delays in fixtures are multiples of the 5 s tick, so permitted
  times always land on tick boundaries and the serialization is exact.
* redirect landing on an out-of-containment host → URL consumed, no page
  row (mirrors the re-check at :218-221 abandoning the iteration).
* redirect landing on an already-visited URL → consumed, nothing stored.
* depth>3 / cycle in the redirect chase → page stored with the redirect
  status and no expansion (:350-351 visited-guard).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from webcrawler_spark.functions.mime import data_type_code_py, image_mime_py
from webcrawler_spark.functions.urls import (
    canonicalize_url_py,
    in_containment_py,
    is_binary_extension_py,
    is_rejected_scheme_py,
    url_host_py,
)

TICK_MS = 5000  # DEFAULT_DELAY, WebCrawler.java:34
MAX_REDIRECT_DEPTH = 3


@dataclass
class SimResult:
    trace: list = field(default_factory=list)    # (time_ms, seq, url, host)
    pages: dict = field(default_factory=dict)    # url -> dict(type,status,time,seq)
    links: list = field(default_factory=list)    # (from_url, to_url)
    images: list = field(default_factory=list)   # (page_url, src, content_type)
    image_captions: list = field(default_factory=list)  # (page_url, src, alt)
    page_data: list = field(default_factory=list)  # (url, data_type_code|None)
    sites: dict = field(default_factory=dict)    # domain -> (robots_content|None, sitemap_content|None)
    seen: set = field(default_factory=set)       # all admitted-or-visited URLs

    def trace_df(self) -> pd.DataFrame:
        return pd.DataFrame(self.trace, columns=["time_ms", "seq", "url", "host"])

    def pages_df(self) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {"url": u, **v}
                for u, v in self.pages.items()
            ]
        )


def _site_content_map(robots: pd.DataFrame):
    """host → (robots_content, sitemap_content) for live (non-HTML-page)
    robots — the payload of the reference's editSite on a successful raw
    fetch (WebCrawler.java:116): raw body + Arrays.toString(sitemaps).
    HTML-page robots and absent hosts fall through to (None, None), like
    the addSite(domain, null, null) row that never gets edited."""
    out = {}
    has_body = "body" in robots.columns
    has_maps = "sitemaps" in robots.columns
    for _, r in robots.iterrows():
        if bool(r.get("is_html_page", False)):
            continue
        maps = list(r["sitemaps"] or []) if has_maps else []
        out[r["host"]] = (
            r["body"] if has_body else None,
            "[" + ", ".join(maps) + "]",
        )
    return out


def _robots_maps(robots: pd.DataFrame):
    """host → ((disallow_prefixes, allow_prefixes), delay_ms). HTML-page
    robots are rejected (WebCrawler.java:108-112) ⇒ treated as absent;
    crawl-delay 0 falls back to the default (:178-179)."""
    rules, delay = {}, {}
    has_allow = "allow_prefixes" in robots.columns
    for _, r in robots.iterrows():
        if bool(r.get("is_html_page", False)):
            continue
        allow = list(r["allow_prefixes"] or []) if has_allow else []
        rules[r["host"]] = (list(r["disallow_prefixes"] or []), allow)
        d = r.get("crawl_delay_s")
        delay[r["host"]] = int(d) * 1000 if d and int(d) > 0 else TICK_MS
    return rules, delay


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


def simulate(
    webgraph: pd.DataFrame,
    robots: pd.DataFrame,
    seeds: list[str],
    seed_domains: tuple[str, ...] = ("gov.si",),
    max_pages: int | None = None,
    max_rounds: int = 10_000,
) -> SimResult:
    wg = {r["url"]: r for r in webgraph.to_dict("records")}
    host_ip = {}
    for r in webgraph.itertuples():
        host_ip.setdefault(r.host, r.ip)
    host_rules, delay_ms = _robots_maps(robots)
    site_content = _site_content_map(robots)

    res = SimResult()
    frontier: list[tuple[int, str]] = []  # (seq, url), insertion-ordered
    permitted: dict[tuple[str, str], int] = {}  # ("d",host)/("i",ip) -> ms
    seq_counter = 0
    stored = 0  # non-FRONTIER pages, the reference's pageCount (:147)
    content_map: dict[str, str] = {}  # exact text → first-writer URL (J5/W2)

    def ip_of(host: str | None) -> str:
        return host_ip.get(host, "0.0.0.0")

    def robots_allows(host: str | None, url: str) -> bool:
        # longest-match Allow/Disallow, allow wins ties (F9); written
        # independently of RobotsRules.allows so engine↔simulator parity
        # genuinely cross-checks the Catalyst expression
        rules = host_rules.get(host)
        if rules is None or not rules[0]:
            return True  # no robots / no Disallow ⇒ allowed
        disallow_p, allow_p = rules
        path = _path_of(url)
        dl = max((len(p) for p in disallow_p if p and path.startswith(p)), default=None)
        if dl is None:
            return True
        al = max((len(p) for p in allow_p if p and path.startswith(p)), default=-1)
        return al >= dl

    for s in seeds:
        c = canonicalize_url_py(s)
        frontier.append((seq_counter, c))
        res.seen.add(c)
        res.pages[c] = {"page_type_code": "FRONTIER", "status": None,
                        "time_ms": None, "seq": seq_counter}
        seq_counter += 1

    now = 0
    rounds = 0
    while frontier and rounds < max_rounds:
        if max_pages is not None and stored >= max_pages:
            break
        # scan for first politeness-eligible URL (WebCrawler.java:163-191)
        pick_i = None
        for i, (sq, u) in enumerate(frontier):
            h = url_host_py(u)
            if permitted.get(("d", h), 0) <= now and permitted.get(("i", ip_of(h)), 0) <= now:
                pick_i = i
                break
        if pick_i is None:
            now += TICK_MS  # sleep-and-rescan, quantized
            rounds += 1
            continue

        sq, url = frontier.pop(pick_i)
        h = url_host_py(url)
        d = delay_ms.get(h, TICK_MS)
        # reservation at dequeue, stamped on BOTH keys (:182-185)
        permitted[("d", h)] = now + d
        permitted[("i", ip_of(h))] = now + d
        res.trace.append((now, sq, url, h))
        # site row at first dequeue per domain (WebCrawler.java:77-124):
        # content when a live robots exists, nulls otherwise. In the
        # fixture world robots are known up-front, so fully-robots-denied
        # hosts are never dequeued and get no row on either side (the
        # reference, fetching robots lazily, would give them a content
        # row) — engine and simulator agree by construction.
        if h not in res.sites:
            res.sites[h] = site_content.get(h, (None, None))

        # --- redirect chase (:346-358) ---
        landed, chain, depth = url, {url}, 0
        loop_hit = False
        while landed in wg and wg[landed]["redirect_to"] is not None:
            nxt = canonicalize_url_py(wg[landed]["redirect_to"])
            depth += 1
            if nxt in chain or depth > MAX_REDIRECT_DEPTH:
                loop_hit = True
                break
            chain.add(nxt)
            res.seen.add(nxt)  # intermediates marked seen (:348,353)
            landed = nxt

        if loop_hit:
            res.pages[url] = {"page_type_code": "HTML", "status": 301,
                              "time_ms": now, "seq": sq}
            stored += 1
            continue

        if landed != url:
            lh = url_host_py(landed)
            if not in_containment_py(lh, seed_domains):
                res.pages.pop(url, None)
                continue  # containment re-check on the landed URL (:218-221)
            if landed in res.pages and res.pages[landed]["page_type_code"] != "FRONTIER":
                res.pages.pop(url, None)
                continue  # already visited
            res.pages.pop(url, None)
            url, h = landed, lh

        # already visited (possible when an earlier redirect landed here):
        # pick consumed, nothing stored
        if res.pages.get(url, {"page_type_code": "FRONTIER"})["page_type_code"] != "FRONTIER":
            continue

        row = wg.get(url)
        if row is None:
            res.pages[url] = {"page_type_code": "HTML", "status": 404,
                              "time_ms": now, "seq": sq}
            stored += 1
            continue

        if row["content_type"] != "text/html":
            res.pages[url] = {"page_type_code": "BINARY", "status": int(row["status"]),
                              "time_ms": now, "seq": sq}
            # one page_data row per BINARY page, code null on switch
            # fall-through (DatabaseHandler.java:177-178, WebCrawler.java:369-371)
            res.page_data.append((url, data_type_code_py(row["content_type"])))
            stored += 1
            continue

        # --- content dedup: exact match on collapsed text (:230-250).
        # The reference scans every stored content (DatabaseHandler.java:
        # 154-169); a dict keyed by the exact text is semantically identical.
        text = row["text_norm"]
        original = content_map.get(text) if text is not None else None
        if original is not None:
            res.pages[url] = {"page_type_code": "DUPLICATE", "status": int(row["status"]),
                              "time_ms": now, "seq": sq}
            res.links.append((url, original))
            stored += 1
            continue

        res.pages[url] = {"page_type_code": "HTML", "status": int(row["status"]),
                          "time_ms": now, "seq": sq}
        if text is not None:
            content_map[text] = url
        stored += 1

        # --- expansion: admission predicate (:391-414) ---
        batch: list[str] = []
        batch_set: set[str] = set()
        for raw in row["out_links"]:
            if is_rejected_scheme_py(raw):
                continue
            c = canonicalize_url_py(raw)
            if not c:
                continue
            ch = url_host_py(c)
            if ch is None or not in_containment_py(ch, seed_domains):
                continue
            if is_binary_extension_py(c):
                continue
            if c in batch_set or c in res.seen:
                continue
            if not robots_allows(ch, c):
                continue
            batch.append(c)
            batch_set.add(c)
        for c in batch:
            frontier.append((seq_counter, c))
            res.seen.add(c)
            res.pages[c] = {"page_type_code": "FRONTIER", "status": None,
                            "time_ms": None, "seq": seq_counter}
            res.links.append((url, c))
            seq_counter += 1

        # --- images: src-only records, data: URIs skipped (:300-309) ---
        # alt guard mirrors the engine's caption_records exactly: a
        # missing column OR a NULL value -> "" per src; a SHORTER alts
        # list pads None (the engine's arrays_zip pads null)
        alts = row["img_alts"] if "img_alts" in row else None
        if not isinstance(alts, (list, tuple)):
            alts = [""] * len(row["img_srcs"])
        for i, src in enumerate(row["img_srcs"]):
            if src.startswith("data"):
                continue
            ext = src.rsplit(".", 1)[-1] if "." in src.rsplit("/", 1)[-1] else ""
            res.images.append((url, src, image_mime_py(ext)))
            res.image_captions.append((url, src, alts[i] if i < len(alts) else None))

        res.seen.add(url)

    return res
