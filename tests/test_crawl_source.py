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
