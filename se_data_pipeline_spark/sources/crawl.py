"""Web-scrape seed-list producer (SURVEY §2.1 S12): the reference's
Selenium pagination loop over the starngage influencer ranking
(starngage_crawler.ipynb cell 0, lines L5-L40) — 49 pages, the
channel-name anchors matched by the CSS selector
``#page-content a.link.color-pink.text-break``, names appended to
``starngage_5000.txt`` (one per line) which the rest of the pipeline
reads with the S4 text-lines scan.

Re-expressed in the adapter pattern every other external-world source
here uses (yt-dlp: acquire.py; Data API: rest.py): URL construction
and HTML anchor extraction are PURE functions tested against recorded
fixture HTML; only the page fetch needs a browser/network (injectable
``fetcher``; the Selenium/omni-driver session of the reference is one
possible fetcher, requests+cookies another). The crawl itself stays
driver-side — it is a seed-LIST producer, bounded at ~50 pages x 100
names, not a data-scale operator (SURVEY scopes it out-of-engine);
the list lands in the engine through ``seed_channels`` /
``write_seed_list`` + ``files.read_url_lines``.
"""

from __future__ import annotations

import os
from html.parser import HTMLParser
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RANKING_URL = "https://starngage.com/plus/vi-vn/influencer/ranking/youtube/vietnam"

# The reference walks 49 next-clicks == 50 pages (cell 0 loop bound).
DEFAULT_PAGES = 50

# The anchor classes the reference's CSS selector requires
# (#page-content a.link.color-pink.text-break).
_ANCHOR_CLASSES = frozenset({"link", "color-pink", "text-break"})

# HTML void elements (per the WHATWG spec) have NO end tag even when
# written unclosed (<img src=...>, <br>): handle_starttag fires but
# handle_endtag never will, so they must not affect depth/scope
# accounting or the #page-content scope would never close and
# footer/nav anchors with the same styling classes would leak in.
_VOID_ELEMENTS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "source", "track", "wbr",
})


def ranking_page_url(page: int) -> str:
    """Pagination URL for 1-based page N — the ?page=N cursor behind
    the `a.page-link` next-button the reference clicks."""
    if page <= 1:
        return RANKING_URL
    return f"{RANKING_URL}?page={page}"


class _AnchorTextParser(HTMLParser):
    """Collect text of <a> tags carrying all of _ANCHOR_CLASSES inside
    the #page-content subtree — stdlib equivalent of the reference's
    find_elements(By.CSS_SELECTOR, ...). Tracks the #page-content
    scope by element depth so sibling nav/footer anchors with the same
    styling classes are NOT collected."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._depth = 0
        self._content_depth: int | None = None
        self._in_anchor = False
        self._buf: list[str] = []
        self.texts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_ELEMENTS:
            # void element in its normal unclosed form: no end tag
            # will ever come — keep depth flat, like handle_startendtag
            if tag == "br" and self._in_anchor:
                # Selenium's a.text renders <br> as a line break; the
                # whitespace-normalizing join turns it into one space
                self._buf.append(" ")
            return
        self._depth += 1
        a = dict(attrs)
        if self._content_depth is None and a.get("id") == "page-content":
            self._content_depth = self._depth
            return
        if (
            tag == "a"
            and self._content_depth is not None
            and _ANCHOR_CLASSES <= set((a.get("class") or "").split())
        ):
            self._in_anchor = True
            self._buf = []

    def handle_endtag(self, tag):
        if tag in _VOID_ELEMENTS:
            # a stray </br>-style bogus end tag must not pop scope:
            # its start tag never pushed depth
            return
        if tag == "a" and self._in_anchor:
            self._in_anchor = False
            text = " ".join("".join(self._buf).split())
            if text:
                self.texts.append(text)
        if (
            self._content_depth is not None
            and self._depth == self._content_depth
        ):
            self._content_depth = None
        self._depth = max(0, self._depth - 1)

    def handle_startendtag(self, tag, attrs):
        # self-closing (<br/>, <img/>) opens no scope: keep depth flat
        if tag == "br" and self._in_anchor:
            self._buf.append(" ")

    def handle_data(self, data):
        if self._in_anchor:
            self._buf.append(data)


def parse_ranking_anchors(html: str) -> list[str]:
    """One page of ranking HTML → ordered channel-name list (the
    a.text extraction of cell 0, whitespace-normalized)."""
    p = _AnchorTextParser()
    p.feed(html)
    return p.texts


def _requests_fetcher(url: str) -> str:  # pragma: no cover - needs network
    import requests

    resp = requests.get(url, timeout=30)
    resp.raise_for_status()
    return resp.text


class StarngageCrawler:
    """S12 backend: paged ranking crawl behind an injectable
    ``fetcher(url) -> html`` (tests: recorded fixture pages; live: a
    requests session or a Selenium page_source closure)."""

    def __init__(self, fetcher: Callable[[str], str] | None = None):
        self._fetch = fetcher if fetcher is not None else _requests_fetcher

    def crawl(self, pages: int = DEFAULT_PAGES) -> list[str]:
        """Walk pages 1..pages, concatenating each page's anchors in
        order — all_texts.extend of the reference. An empty page ends
        the walk early (the ranking ran out before the bound)."""
        names: list[str] = []
        for page in range(1, pages + 1):
            got = parse_ranking_anchors(self._fetch(ranking_page_url(page)))
            if not got:
                break
            names.extend(got)
        return names


def write_seed_list(names: list[str], path: str) -> None:
    """The reference's sink: one name per line (cell 0 finally-block
    '\\n'.join write). Plain driver-side file — the list is bounded by
    the page walk, never data-scale."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(names))


def seed_channels(spark: SparkSession, names: list[str]) -> DataFrame:
    """Seed list → engine: (rank, name) rows, rank preserving the
    crawl order (the ranking position cells 1-3 rely on), names
    trimmed and de-blanked exactly like the S4 line scan."""
    df = spark.createDataFrame(
        list(enumerate(names, start=1)), "rank int, name string"
    )
    return df.select(
        "rank", F.trim(F.col("name")).alias("name")
    ).filter(F.col("name") != "")
