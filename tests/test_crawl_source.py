"""S12 seed-list crawler tests (sources/crawl.py): recorded-fixture
HTML shaped like the starngage ranking page drives the pure parse
path; an injectable fetcher drives pagination; the output lands in
the engine through the same S4 text-lines scan the reference uses
(starngage_crawler.ipynb cells 0-3)."""

from __future__ import annotations

from se_data_pipeline_spark.sources.crawl import (
    DEFAULT_PAGES,
    RANKING_URL,
    StarngageCrawler,
    parse_ranking_anchors,
    ranking_page_url,
    seed_channels,
    write_seed_list,
)
from se_data_pipeline_spark.sources.files import read_url_lines


def _page_html(names: list[str], with_noise: bool = True) -> str:
    """Fixture page mirroring the starngage ranking structure: the
    channel anchors carry class="link color-pink text-break" inside
    #page-content; nav/footer anchors reuse the same classes OUTSIDE
    it (the scope trap the CSS selector #page-content ... encodes)."""
    rows = "\n".join(
        f'<tr><td>{i}</td><td><a class="link color-pink text-break" '
        f'href="/plus/ch{i}">{n}</a></td>'
        f'<td><a class="page-link" href="#">follow</a></td></tr>'
        for i, n in enumerate(names, 1)
    )
    noise = (
        '<a class="link color-pink text-break" href="/promo">OUTSIDE</a>'
        if with_noise
        else ""
    )
    return f"""
    <html><body>
      <header>{noise}</header>
      <div id="page-content">
        <table><tbody>{rows}</tbody></table>
        <ul><li><a class="page-link" href="?page=2">Next</a></li></ul>
      </div>
      <footer>{noise}</footer>
    </body></html>
    """


def test_parse_anchors_scoped_and_ordered():
    names = ["Kênh Một", "Channel  Two", "Ba"]
    got = parse_ranking_anchors(_page_html(names))
    # whitespace-normalized, crawl order preserved, out-of-scope
    # anchors and page-link anchors excluded
    assert got == ["Kênh Một", "Channel Two", "Ba"]


def test_parse_anchors_unclosed_void_elements_do_not_leak_scope():
    """Realistic HTML writes void elements UNCLOSED (<img src=...>,
    <br>, <input>): they fire handle_starttag but never an end tag,
    so counting them toward depth would keep the #page-content scope
    open forever and leak footer/nav anchors with the same styling
    classes into the seed list (ADVICE r6 medium). Void elements in
    both forms must leave scope accounting untouched, including a
    stray bogus </br> end tag."""
    html = """
    <html><body>
      <div id="page-content">
        <img src="/banner.png"><br><input type="text">
        <table><tbody><tr><td>
          <img src="/avatar1.png">
          <a class="link color-pink text-break" href="/c1">In One</a><br>
          <a class="link color-pink text-break" href="/c2">In<br>Two</a>
          </br>
        </td></tr></tbody></table>
        <hr><meta charset="utf-8">
      </div>
      <footer>
        <a class="link color-pink text-break" href="/promo">OUTSIDE</a>
      </footer>
    </body></html>
    """
    assert parse_ranking_anchors(html) == ["In One", "In Two"]


def test_parse_anchors_self_closed_voids_still_fine():
    """XHTML-style self-closed voids go through handle_startendtag —
    already scope-neutral; mixing both forms must not desync depth."""
    html = """
    <html><body>
      <div id="page-content">
        <img src="/a.png"/><br/>
        <a class="link color-pink text-break" href="/c">Name</a>
      </div>
      <a class="link color-pink text-break" href="/x">OUT</a>
    </body></html>
    """
    assert parse_ranking_anchors(html) == ["Name"]


def test_parse_anchors_empty_page():
    assert parse_ranking_anchors("<html><body></body></html>") == []
    assert parse_ranking_anchors(_page_html([], with_noise=True)) == []


def test_ranking_page_url_contract():
    assert ranking_page_url(1) == RANKING_URL
    assert ranking_page_url(2) == RANKING_URL + "?page=2"
    assert DEFAULT_PAGES == 50  # the reference's 49 next-clicks + 1


def test_crawler_paginates_and_stops_early():
    pages = {
        ranking_page_url(1): _page_html(["A", "B"]),
        ranking_page_url(2): _page_html(["C"]),
        ranking_page_url(3): _page_html([]),  # ranking exhausted
        ranking_page_url(4): _page_html(["NEVER"]),
    }
    fetched = []

    def fetcher(url: str) -> str:
        fetched.append(url)
        return pages[url]

    got = StarngageCrawler(fetcher).crawl(pages=10)
    assert got == ["A", "B", "C"]
    assert fetched == [ranking_page_url(p) for p in (1, 2, 3)]


def test_crawler_respects_page_bound():
    calls = []

    def fetcher(url: str) -> str:
        calls.append(url)
        return _page_html(["X"])

    StarngageCrawler(fetcher).crawl(pages=3)
    assert len(calls) == 3


def test_seed_list_roundtrip_through_s4_scan(spark, tmp_path):
    """write_seed_list -> the S4 text-lines scan (cells 1-3 read the
    same file): one row per non-blank trimmed name."""
    names = ["Kênh Một", "", "  Hai  "]
    path = str(tmp_path / "starngage_5000.txt")
    write_seed_list(names, path)
    rows = [r["url"] for r in read_url_lines(spark, path).collect()]
    assert rows == ["Kênh Một", "Hai"]


def test_seed_channels_dataframe(spark):
    df = seed_channels(spark, ["A", " B ", ""])
    got = [(r["rank"], r["name"]) for r in df.collect()]
    assert got == [(1, "A"), (2, "B")]
