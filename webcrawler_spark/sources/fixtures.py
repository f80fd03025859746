"""Deterministic synthetic fixtures (FIXTURES.md) — the web served to the
fetch stage, replacing live HTTP/Chrome (which are REF-ONLY, SURVEY.md §2.1 S2).

Everything is a pure function of (seed, scale): no network, no external
data. Shapes mirror the reference's published run: ~150 hosts under one
containment domain with Zipf page-count skew (crawler/report/main.tex:134),
~20% duplicate-content pages (main.tex:157), redirect chains with one cycle
(WebCrawler.java:346-358), robots with crawl-delay overrides incl. the
zero-delay fallback quirk (WebCrawler.java:175-179), HTML-at-robots hosts
that must be rejected (WebCrawler.java:108-112), and link traps
(javascript:/tel:/mailto:, CrawlerUrl.java:19-24; data: img srcs,
WebCrawler.java:300).

The graft `images` table follows BASELINE.json input_hint exactly:
(image_id string, bytes binary, w int, h int, fmt string, caption string,
phash int64), with procedurally rendered pixels so ground truth can be
re-rendered from image_id alone for the per-row invariant test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from webcrawler_spark.functions.images import encode_image, phash64

SEED = 42

# verbatim reference seeds (WebCrawler.java:28-31)
SEED_URLS = (
    "http://gov.si",
    "http://evem.gov.si",
    "http://e-uprava.gov.si",
    "http://e-prostor.gov.si",
)

CONTAINMENT = ("gov.si",)
DEFAULT_DELAY_S = 5  # WebCrawler.java:34 (5000 ms)

_WORDS = (
    "podatki storitve obrazec vloga zakon uprava register prostor davki "
    "promet okolje zdravje sola delo trg evidenca potrdilo narocilo sistem "
    "informacije objava razpis sklep porocilo analiza statistika karta"
).split()


def make_hosts(n_hosts: int = 30, out_of_scope_frac: float = 0.1) -> list[dict]:
    """Host universe: seed hosts first, then h{i}.gov.si, plus out-of-scope.

    Some hosts share an IP (every 3rd) to exercise IP-keyed politeness
    (WebCrawler.java:165-170,184).
    """
    hosts = ["gov.si", "evem.gov.si", "e-uprava.gov.si", "e-prostor.gov.si"]
    hosts += [f"h{i}.gov.si" for i in range(max(0, n_hosts - len(hosts)))]
    n_out = max(1, int(len(hosts) * out_of_scope_frac))
    hosts += [f"x{i}.example.com" for i in range(n_out)]
    out = []
    for i, h in enumerate(hosts):
        ip_group = i // 3  # 3 hosts per IP
        out.append({
            "host": h,
            "ip": f"10.0.{ip_group // 250}.{ip_group % 250}",
            "in_scope": h.endswith("gov.si"),
        })
    return out


def make_robots(hosts: list[dict], seed: int = SEED) -> pd.DataFrame:
    """Robots dimension (FIXTURES.md §4). Deterministic per host."""
    rng = np.random.default_rng(seed + 1)
    rows = []
    for i, h in enumerate(hosts):
        r = rng.random()
        if r < 0.10:
            continue  # no robots ⇒ allow-all (WebCrawler.java:408-409)
        is_html = r > 0.95  # robots URL serves an HTML page ⇒ rejected
        # crawl delays multiples of the 5 s base tick so the BSP round
        # clock reproduces the reference serialization exactly (SURVEY §7)
        delay = int(rng.choice([0, 5, 5, 5, 10, 15], p=[.1, .3, .2, .2, .1, .1]))
        disallow = ["/private"] if rng.random() < 0.5 else []
        if rng.random() < 0.2:
            disallow.append("/admin")
        # Allow carve-outs under a Disallow prefix — exercises the
        # longest-match Allow/Disallow rule end to end (F9): /private is
        # blocked but /private/open is crawlable
        allow = ["/private/open"] if disallow and rng.random() < 0.6 else []
        if is_html:
            body = "<html><body><h1>404 robots</h1></body></html>"
        else:
            lines = ["User-agent: *"]
            lines += [f"Disallow: {p}" for p in disallow]
            lines += [f"Allow: {p}" for p in allow]
            if delay:
                lines.append(f"Crawl-delay: {delay}")
            lines.append(f"Sitemap: http://{h['host']}/sitemap.xml")
            body = "\n".join(lines) + "\n"
        rows.append({
            "host": h["host"],
            "body": body,  # raw robots.txt — what the engine parses (S4)
            # structured truth, used by the simulator oracle; the engine
            # parsing `body` and matching the simulator proves the parser
            "disallow_prefixes": disallow,
            "allow_prefixes": allow,
            "crawl_delay_s": delay,
            "sitemaps": [f"http://{h['host']}/sitemap.xml"],
            "is_html_page": bool(is_html),
        })
    return pd.DataFrame(rows)


def _page_text(rng: np.random.Generator, dup_group: int | None) -> str:
    if dup_group is not None:
        # group representative text: pure function of the group id
        g = np.random.default_rng(77_000 + dup_group)
        words = g.choice(_WORDS, size=30)
    else:
        words = rng.choice(_WORDS, size=int(rng.integers(20, 60)))
    return " ".join(words.tolist())


def make_webgraph(
    n_hosts: int = 30,
    pages_per_host_base: int = 40,
    seed: int = SEED,
    dup_frac: float = 0.2,
    redirect_frac: float = 0.05,
    binary_frac: float = 0.05,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build (webgraph, robots). Zipf(1.2) page counts per host.

    URL space: http://{host}/p{j} for HTML pages, /d{j}.{ext} for binary
    docs, /private/p{j} for robots-disallowed pages. Link strings embedded
    in html are *messy* variants (query strings, fragments, `.html`
    insertions, traps) that canonicalize back to member URLs — exercising
    F1-F7 + J2 at admission time.
    """
    rng = np.random.default_rng(seed)
    hosts = make_hosts(n_hosts)
    robots = make_robots(hosts, seed)

    # Zipf page counts, host 0 (gov.si) hottest — the skew head
    counts = np.maximum(
        (pages_per_host_base / np.power(np.arange(1, len(hosts) + 1), 1.2)), 3
    ).astype(int)

    pages = []  # (url, host, ip, kind, disallowed)
    per_host_urls: dict[str, list[str]] = {}
    for hi, h in enumerate(hosts):
        n = int(counts[hi])
        urls = []
        for j in range(n):
            r = rng.random()
            if j == 0:
                # host root — seeds (WebCrawler.java:28-31) enter here
                url, kind = f"http://{h['host']}", "html"
                urls.append(url)
                pages.append({"url": url, "host": h["host"], "ip": h["ip"], "kind": kind})
                continue
            if r < binary_frac and j > 0:
                ext = rng.choice(["pdf", "doc", "docx", "zip", "csv"])
                url = f"http://{h['host']}/d{j}.{ext}"
                kind = "binary"
            elif r < binary_frac + 0.08 and j > 0:
                url = f"http://{h['host']}/private/p{j}"
                kind = "disallowed"
            elif r < binary_frac + 0.11 and j > 0:
                # under the /private Disallow but inside the /private/open
                # Allow carve-out — crawlable iff the host's robots carries
                # the Allow line (longest-match F9)
                url = f"http://{h['host']}/private/open/p{j}"
                kind = "html"
            else:
                url = f"http://{h['host']}/p{j}"
                kind = "html"
            urls.append(url)
            pages.append({"url": url, "host": h["host"], "ip": h["ip"], "kind": kind})
        per_host_urls[h["host"]] = urls

    all_urls = [p["url"] for p in pages]
    n_pages = len(pages)

    # duplicate-content groups over html pages (~20%, main.tex:157)
    html_idx = [i for i, p in enumerate(pages) if p["kind"] == "html"]
    n_dup = int(len(html_idx) * dup_frac)
    dup_members = rng.choice(html_idx, size=n_dup, replace=False)
    n_groups = max(1, n_dup // 3)
    group_of: dict[int, int] = {}
    for k, i in enumerate(dup_members):
        group_of[int(i)] = int(k % n_groups)

    # redirects among html pages (depth ≤ 3 chains + one 2-cycle);
    # seed roots never redirect (the crawl must be able to start)
    redirectable = [i for i in html_idx if pages[i]["url"] not in SEED_URLS]
    redir_idx = [i for i in redirectable if rng.random() < redirect_frac]
    redirect_to: dict[int, str] = {}
    for i in redir_idx:
        tgt = int(rng.choice(html_idx))
        if tgt != i:
            redirect_to[i] = pages[tgt]["url"]
    if len(redirectable) >= 2:  # guaranteed cycle to exercise the guard
        a, b = redirectable[-1], redirectable[-2]
        redirect_to[a] = pages[b]["url"]
        redirect_to[b] = pages[a]["url"]

    def messy(url: str, r: float) -> str:
        if r < 0.15:
            return url + "?utm_source=x&ref=1"
        if r < 0.25:
            return url + "#section-2"
        if r < 0.32:
            # insert a .html the canonicalizer must delete (CrawlerUrl.java:28)
            return url + ".html"
        if r < 0.36:
            return url + ".html?x=1#top"
        return url

    TRAPS = ["javascript:void(0)", "mailto:info@gov.si", "tel:+38612345678", ""]

    rows = []
    for i, p in enumerate(pages):
        prng = np.random.default_rng(seed * 1_000_003 + i)
        if p["kind"] == "binary":
            ext = p["url"].rsplit(".", 1)[-1]
            ct = {
                "pdf": "application/pdf",
                "doc": "application/msword",
                "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
                "zip": "application/zip",
                "csv": "text/csv",
            }[ext]
            rows.append({**p, "status": 200, "content_type": ct,
                         "redirect_to": None, "html": None, "text_norm": None,
                         "dup_group": -1, "out_links": [], "img_srcs": [],
                         "img_alts": []})
            continue
        if i in redirect_to:
            rows.append({**p, "status": 301, "content_type": "text/html",
                         "redirect_to": redirect_to[i], "html": None,
                         "text_norm": None, "dup_group": -1,
                         "out_links": [], "img_srcs": [], "img_alts": []})
            continue
        if p["kind"] == "html" and p["url"] not in SEED_URLS and (
            prng.random() < 0.04 or p["url"].endswith("/p2")
        ):
            # "sneaky binary": innocuous URL, binary content-type — the
            # HEAD-probe path to BINARY pages (WebCrawler.java:334-378).
            # Every host's /p2 is deterministically sneaky so small test
            # webgraphs reach BINARY pages (and page_data rows, X1) too;
            # alternate the content type so the X1 switch's match AND
            # fall-through (zip → null code) branches are both exercised.
            ct = "application/pdf" if i % 2 == 0 else "application/zip"
            rows.append({**p, "status": 200, "content_type": ct,
                         "redirect_to": None, "html": None, "text_norm": None,
                         "dup_group": -1, "out_links": [], "img_srcs": [],
                         "img_alts": []})
            continue

        # outgoing links: mostly same-host, some cross-host/out-of-scope
        n_out = int(prng.integers(3, 10))
        targets = []
        same = per_host_urls[p["host"]]
        for _ in range(n_out):
            if prng.random() < 0.75:
                targets.append(same[int(prng.integers(0, len(same)))])
            else:
                targets.append(all_urls[int(prng.integers(0, n_pages))])
        raw_links = [messy(t, prng.random()) for t in targets]
        # traps + occasional onclick-style link
        if prng.random() < 0.4:
            raw_links.append(str(prng.choice(TRAPS)))
        onclick = None
        if prng.random() < 0.3:
            tgt = same[int(prng.integers(0, len(same)))]
            onclick = tgt
            raw_links.append(tgt)

        img_srcs = []
        n_img = int(prng.integers(0, 4))
        for k in range(n_img):
            if prng.random() < 0.15:
                img_srcs.append("data:image/png;base64,iVBORw0KGgo=")
            else:
                # hot-img skew: a few srcs repeat across the whole site
                if prng.random() < 0.3:
                    img_srcs.append("http://gov.si/logo.png")
                else:
                    img_srcs.append(f"http://{p['host']}/img{k}.jpg")

        # the pages carry the image's caption as alt text — the source
        # the pair pipeline's caption column comes from (X4 extraction)
        img_alts = [caption_of(image_id_of_src(s)) for s in img_srcs]

        dg = group_of.get(i)
        text = _page_text(prng, dg)
        body = []
        for li, l in enumerate(raw_links):
            if onclick is not None and li == len(raw_links) - 1:
                body.append(
                    f"<button onclick=\"location.href='{l}'\">go</button>"
                )
            else:
                body.append(f'<a href="{l}">link{li}</a>')
        for s, a in zip(img_srcs, img_alts):
            body.append(f'<img src="{s}" alt="{a}"/>')
        html = (
            "<html><head><title>t</title></head><body>"
            + "".join(body)
            + f"<p>{text}</p></body></html>"
        )
        rows.append({**p, "status": 200, "content_type": "text/html",
                     "redirect_to": None, "html": html, "text_norm": text,
                     "dup_group": -1 if dg is None else dg,
                     "out_links": raw_links, "img_srcs": img_srcs,
                     "img_alts": img_alts})

    wg = pd.DataFrame(rows)
    return wg, robots


def image_id_of_src(src: str) -> str:
    """Canonical payload key for a crawl-discovered img src — the
    crawl→payload join key (north_rule: frontier over image+caption pair
    tables). crc32: same polynomial in zlib, DuckDB and Spark, so the key
    is computable on any side without a UDF."""
    import zlib

    return f"img{zlib.crc32(src.encode('utf-8')) % 1_000_000_000:010d}"


def caption_of(image_id: str) -> str:
    """Ground-truth caption as a pure function of image_id (the alt text
    the synthetic pages carry; exact-equality oracle for the pair
    pipeline)."""
    idx = int(image_id.replace("img", ""))
    words = np.random.default_rng(910_000 + idx).choice(_WORDS, size=6)
    return " ".join(words.tolist())


def render_image(image_id: str) -> tuple[np.ndarray, int, int, str, str]:
    """Ground-truth pixels + params as a pure function of image_id.

    Returns (pixels, w, h, fmt, caption). Re-rendering from image_id alone
    is what makes the per-row invariant testable with no stored ground
    truth (BASELINE.json input_hint).
    """
    idx = int(image_id.replace("img", ""))
    r = np.random.default_rng(900_000 + idx)
    w = int(r.choice([32, 64, 128, 256]))
    h = int(r.choice([32, 64, 128, 256]))
    fmt = "png" if r.random() < 0.5 else "jpeg"
    x = np.linspace(0, 1, w)[None, :]
    y = np.linspace(0, 1, h)[:, None]
    img = np.stack([
        x * r.uniform(100, 220) + y * r.uniform(10, 60),
        y * r.uniform(100, 200) + x * r.uniform(10, 60),
        (x + y) * r.uniform(40, 120) + r.uniform(0, 40),
    ], axis=-1)
    cx, cy, rad = r.uniform(0.2, 0.8), r.uniform(0.2, 0.8), r.uniform(0.1, 0.35)
    mask = (x - cx) ** 2 + (y - cy) ** 2 < rad ** 2
    img[mask] = img[mask] * 0.5 + r.uniform(50, 120)
    pixels = np.clip(img, 0, 255).astype(np.uint8)
    return pixels, w, h, fmt, caption_of(image_id)


def make_images(n: int = 200) -> pd.DataFrame:
    """The graft payload table, schema per BASELINE.json input_hint.

    ``phash`` is the hash of the STORED ARTIFACT — ``phash64(decode(
    bytes))`` — not of the pre-encode pixels: for a lossy fmt the two
    differ by a few DCT-boundary bits on ~7% of images (measured at 16k
    rows), so hashing the pre-encode pixels makes the per-row invariant
    ``recompute(decode(bytes)) == phash`` flaky at scale. Anchoring the
    hash to the decoded artifact is also what a production ingest does:
    the consumer can only ever decode what was stored. For png the codec
    is lossless and the two definitions coincide.
    """
    from webcrawler_spark.functions.images import decode_image

    rows = []
    for i in range(n):
        image_id = f"img{i:010d}"
        pixels, w, h, fmt, caption = render_image(image_id)
        data = encode_image(pixels, fmt)
        rows.append({
            "image_id": image_id,
            "bytes": data,
            "w": w,
            "h": h,
            "fmt": fmt,
            "caption": caption,
            "phash": phash64(pixels if fmt == "png" else decode_image(data)),
        })
    return pd.DataFrame(rows)


def make_seeds() -> pd.DataFrame:
    return pd.DataFrame({"url": list(SEED_URLS), "seq": range(len(SEED_URLS))})
