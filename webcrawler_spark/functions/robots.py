"""robots.txt parsing (S4/F9) — reference semantics, no network.

Reference behavior (citations into /root/reference):
* bodies containing ``<html`` / ``<body`` are rejected as "robots served
  an HTML error page" → treated as absent ⇒ allow-all (WebCrawler.java:108-112)
* ``Crawl-delay`` seconds override the politeness default; a zero delay
  falls back to the default (WebCrawler.java:175-179)
* ``Sitemap:`` lines are collected and persisted (WebCrawler.java:115-116)
* access check: any Disallow prefix match for the matching user-agent
  group denies; absent robots ⇒ allowed (WebCrawler.java:408-409)

Parsing follows the original robots.txt convention (user-agent groups,
prefix rules) for the ``*`` agent, matching the reference's library use
(crawlercommons-shaped behavior at the granularity the engine needs:
prefix Disallow/Allow, crawl-delay, sitemaps).

Google-extension wildcard rules (``Disallow: /*?view_mode*`` —
e-uprava.gov.si serves these for real, see tests/test_real_robots_log.py)
are kept as literal prefixes: no URL path starts with ``/*``, so such a
rule never matches — i.e. we are PERMISSIVE where the extension would
block. That is the safe direction for parity evidence (we can never deny
a URL the reference demonstrably visited; asserted over all 83 logged
visits), and the fixtures exercise only standard prefix rules, so
engine↔simulator equality is unaffected.

Surface: pure-Python ``parse_robots_py`` (simulator / fixtures) + an
Arrow-vectorized ``parse_robots_udf`` returning a struct column.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class RobotsRules:
    disallow: list = field(default_factory=list)
    allow: list = field(default_factory=list)
    crawl_delay_s: int = 0
    sitemaps: list = field(default_factory=list)
    is_html_page: bool = False

    def allows(self, path: str) -> bool:
        if self.is_html_page:
            return True  # rejected robots ⇒ treated as absent ⇒ allow
        # longest-match wins between allow and disallow (standard rule);
        # empty Disallow line means allow-all for that group
        best_len, best_allow = -1, True
        for p in self.allow:
            if p and path.startswith(p) and len(p) > best_len:
                best_len, best_allow = len(p), True
        for p in self.disallow:
            if p and path.startswith(p) and len(p) >= best_len + (0 if best_len < 0 else 1):
                if len(p) > best_len or (len(p) == best_len and not best_allow):
                    best_len, best_allow = len(p), False
        return best_allow


def parse_robots_py(body: str | None, user_agent: str = "*") -> RobotsRules:
    r = RobotsRules()
    if body is None:
        return r
    low = body.lower()
    if "<html" in low or "<body" in low:
        r.is_html_page = True
        return r
    applies = False
    seen_any_group = False
    in_ua_run = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key in ("disallow", "allow", "crawl-delay"):
            # only GROUP rules terminate a user-agent run — RFC 9309 treats
            # Sitemap (and unknown records) as non-group lines that must not
            # split "User-agent: a / Sitemap: s / User-agent: b" into two
            # groups
            in_ua_run = False
        if key == "user-agent":
            # consecutive User-agent lines form ONE group (standard REP):
            # the group applies if ANY of its agents match; the run resets
            # at the first rule line after it
            if not in_ua_run:
                applies = False
                in_ua_run = True
            applies = applies or val == "*" or val.lower() == user_agent.lower()
            seen_any_group = True
        elif key == "sitemap":
            r.sitemaps.append(val)
        elif applies or not seen_any_group:
            if key == "disallow" and val:
                r.disallow.append(val)
            elif key == "allow" and val:
                r.allow.append(val)
            elif key == "crawl-delay":
                try:
                    r.crawl_delay_s = int(float(val))
                except ValueError:
                    pass
    return r


ROBOTS_SCHEMA = T.StructType([
    T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
    T.StructField("allow_prefixes", T.ArrayType(T.StringType())),
    T.StructField("crawl_delay_s", T.IntegerType()),
    T.StructField("sitemaps", T.ArrayType(T.StringType())),
    T.StructField("is_html_page", T.BooleanType()),
])


def make_parse_robots_udf():
    @F.pandas_udf(ROBOTS_SCHEMA)
    def parse_robots_udf(body: pd.Series) -> pd.DataFrame:
        rows = []
        for b in body:
            r = parse_robots_py(b if b is None or isinstance(b, str) else str(b))
            rows.append((r.disallow, r.allow, r.crawl_delay_s, r.sitemaps, r.is_html_page))
        return pd.DataFrame(
            rows,
            columns=["disallow_prefixes", "allow_prefixes", "crawl_delay_s",
                     "sitemaps", "is_html_page"],
        )

    return parse_robots_udf
