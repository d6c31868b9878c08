"""In-engine HTTP JSON source — a Spark 4 Python Data Source.

The reference's extract task (``dags/ingest_firmographics_to_snowflake.py:
24-39``) GETs one JSON document per source on the orchestrator. This module
upgrades that to a first-class *engine* source (SURVEY.md §2.A A1): each URL
becomes one input partition, so a list of endpoints fans out across
executors and the fetched documents enter the plan as ordinary RAW-shaped
rows — no driver-side staging file needed (``sources/fetch.py`` remains the
out-of-cluster alternative for air-gapped replay).

Usage::

    spark.dataSource.register(HttpJsonDataSource)
    raw = (spark.read.format("http_json")
           .option("urls", "https://api.example.com/a,https://.../b")
           .option("source", "fortune500")
           .load())

Scale notes: one partition per URL (parallel fetch, retry isolation per
endpoint); payloads stay unparsed JSON strings (the VARIANT analogue —
parsing happens at the staging boundary, same as ``read_json_landing``);
``file://`` URLs are supported for tests and offline replay.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

RAW_SCHEMA = "id bigint, source string, ingested_at timestamp, payload string"


@dataclass
class _UrlPartition(InputPartition):
    index: int
    url: str


class HttpJsonReader(DataSourceReader):
    def __init__(self, options: dict):
        urls = options.get("urls") or options.get("url")
        if not urls:
            raise ValueError("http_json source requires option 'urls' (comma-separated)")
        self.urls = [u.strip() for u in urls.split(",") if u.strip()]
        self.source = options.get("source", "http_json")
        self.timeout = float(options.get("timeout", "30"))

    def partitions(self):
        # one partition per endpoint: fetches run in parallel on executors
        return [_UrlPartition(i, u) for i, u in enumerate(self.urls)]

    def read(self, partition: _UrlPartition):
        import json
        from datetime import datetime, timezone
        from urllib.request import urlopen

        with urlopen(partition.url, timeout=self.timeout) as resp:  # noqa: S310
            text = resp.read().decode("utf-8")
        json.loads(text)  # validate: a truncated/HTML error page fails the task
        yield (
            partition.index,
            self.source,
            datetime.now(timezone.utc).replace(tzinfo=None),
            text,
        )


class HttpJsonDataSource(DataSource):
    """``spark.read.format("http_json")`` — RAW-shaped rows
    ``(id, source, ingested_at, payload)``, one row per fetched document."""

    @classmethod
    def name(cls) -> str:
        return "http_json"

    def schema(self) -> str:
        return RAW_SCHEMA

    def reader(self, schema) -> HttpJsonReader:
        return HttpJsonReader(self.options)

    def simpleStreamReader(self, schema) -> "HttpJsonStreamReader":
        return HttpJsonStreamReader(self.options)


class HttpJsonStreamReader(SimpleDataSourceStreamReader):
    """Streaming poller for the same endpoint family: each micro-batch GETs
    the URL once and emits one RAW-shaped row; the offset is the poll
    counter, checkpointed by Spark, so a restarted query resumes exactly
    where it stopped (exactly-once at the offset level). ``file://`` URLs
    replay deterministically, which is also what ``readBetweenOffsets``
    relies on for failure recovery; live HTTP recovery re-fetches (the
    at-least-once caveat every non-replayable API source carries).
    """

    def __init__(self, options: dict):
        url = options.get("url") or options.get("urls")
        if not url:
            raise ValueError("http_json stream requires option 'url'")
        self.url = url.split(",")[0].strip()
        self.source = options.get("source", "http_json")
        self.timeout = float(options.get("timeout", "30"))
        # bound for availableNow/backfill runs; 0 = unbounded polling
        self.max_polls = int(options.get("maxPolls", "0"))

    def _fetch_row(self, poll: int):
        import json
        from datetime import datetime, timezone
        from urllib.request import urlopen

        with urlopen(self.url, timeout=self.timeout) as resp:  # noqa: S310
            text = resp.read().decode("utf-8")
        json.loads(text)
        return (
            poll,
            self.source,
            datetime.now(timezone.utc).replace(tzinfo=None),
            text,
        )

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def read(self, start: dict):
        n = start["poll"]
        if self.max_polls and n >= self.max_polls:
            return (iter([]), {"poll": n})
        return (iter([self._fetch_row(n)]), {"poll": n + 1})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            self._fetch_row(i) for i in range(start["poll"], end["poll"])
        )

    def commit(self, end: dict) -> None:
        pass
