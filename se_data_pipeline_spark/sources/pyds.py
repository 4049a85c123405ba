"""Python DataSource API (Spark 4) delivery of the paged REST source
(SURVEY §2.1 S7 names this as the modern alternative to the
mapInPandas page operator in sources/rest.py).

The source is a first-class `spark.read.format("channel_api")`: the
planner asks the reader for partitions — ONE PER API PAGE — so page
fetches run in parallel across executors with no driver-side loop,
and rate limiting maps to partition scheduling, not sleeps
(reference: test2.py:11-36 fetches 50-id pages serially). The HTTP
call itself stays behind the same ApiBackend protocol with the
deterministic fake from rest.py; a real backend drops in unchanged.

Scale: a 10M-channel enrichment is 200k partitions of one page each —
Spark schedules them like any scan, with retries per partition
(failed page = retried page, not a restarted driver loop).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from se_data_pipeline_spark.sources.rest import PAGE_SIZE, FakeChannelApi

SCHEMA = (
    "id string, n_videos long, n_views long, n_subs long, custom_url string"
)


class ChannelApiDataSource(DataSource):
    """format("channel_api") — options:
    - ids: comma-separated channel ids (in a real deployment this
      would be a seed-table path; the option keeps the demo hermetic)
    - page_size: ids per API call (default PAGE_SIZE=50)
    - notfound_pct: fake-backend knob (default 10)
    """

    @classmethod
    def name(cls) -> str:
        return "channel_api"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "ChannelApiReader":
        return ChannelApiReader(self.options)


class ChannelApiReader(DataSourceReader):
    def __init__(self, options):
        ids_opt = options.get("ids", "")
        self.ids = [i for i in ids_opt.split(",") if i]
        self.page_size = int(options.get("page_size", str(PAGE_SIZE)))
        self.notfound_pct = int(options.get("notfound_pct", "10"))

    def partitions(self):
        # One input partition per API page: the unit of parallelism,
        # retry, and rate accounting.
        return [
            InputPartition(start)
            for start in range(0, len(self.ids), self.page_size)
        ]

    def read(self, partition: InputPartition):
        page = self.ids[partition.value : partition.value + self.page_size]
        backend = FakeChannelApi(notfound_pct=self.notfound_pct)
        resp = backend.fetch_page(page)
        for cid in page:
            f = resp.get(cid)
            if f is None:
                continue  # absent = not found (J2 anti-join feed)
            yield (
                cid,
                f["n_videos"],
                f["n_views"],
                f["n_subs"],
                f["custom_url"],
            )


def register(spark) -> None:
    spark.dataSource.register(ChannelApiDataSource)


class ChannelApiStreamReader(SimpleDataSourceStreamReader):
    """Offset-paged incremental reader: the streaming twin of the
    batch partitions-per-page reader. The offset IS the page number —
    restart-safe (offsets live in the streaming checkpoint), each
    micro-batch fetches the next page, and an exhausted id list
    parks the stream at a stable offset (no busy re-fetch).

    This is the reference's incremental crawl loop
    (data_pipeline.py:575-598 fetches per-video inside a Python loop)
    as a checkpointed Structured Streaming source: progress survives
    restarts, retries are micro-batch replays, and downstream gets
    exactly-once via the usual sink contracts.
    """

    def __init__(self, options):
        self.page_size = int(options.get("page_size", str(PAGE_SIZE)))
        self.n_ids = int(options.get("n_ids", "0"))
        self.notfound_pct = int(options.get("notfound_pct", "10"))

    def initialOffset(self):
        return {"page": 0}

    def read(self, start):
        page = start["page"]
        lo = page * self.page_size
        ids = [
            f"chan{i:04d}"
            for i in range(lo, min(lo + self.page_size, self.n_ids))
        ]
        if not ids:
            return iter([]), start  # exhausted: hold position
        backend = FakeChannelApi(notfound_pct=self.notfound_pct)
        resp = backend.fetch_page(ids)
        rows = [
            (
                cid,
                f["n_videos"],
                f["n_views"],
                f["n_subs"],
                f["custom_url"],
            )
            for cid, f in sorted(resp.items())
        ]
        return iter(rows), {"page": page + 1}

    def commit(self, end):
        pass  # nothing external to release; checkpoint owns progress


class ChannelApiStreamDataSource(DataSource):
    """readStream.format("channel_api_stream") — options: n_ids,
    page_size, notfound_pct (same fake backend as the batch form)."""

    @classmethod
    def name(cls) -> str:
        return "channel_api_stream"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema) -> ChannelApiStreamReader:
        return ChannelApiStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(ChannelApiStreamDataSource)
