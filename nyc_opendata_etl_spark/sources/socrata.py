"""Socrata (NYC Open Data) connector as a Spark Python DataSource.

The reference scans Socrata with server-side SoQL time-window predicates
and manual fiscal-year partition pruning (``load_311.py:11-17``,
``load_parking.py:11-23,35-68``). Here the same capabilities are a
declarative DataSource:

* **window pushdown** — the ``where`` option compiles to a SoQL
  ``$where`` so filtering happens server-side, like the reference;
* **page parallelism** — each Spark partition fetches one ``$offset``
  page, so a 10M-row backfill reads with N executors in parallel
  instead of one giant request (the reference's single-request
  ``limit=10_000_000`` ceiling, ``load_311.py:11``);
* **FY routing** — :func:`fiscal_year_dataset` maps a window start to
  the per-fiscal-year dataset id exactly like the reference's manual
  partition map.

For tests/offline use, the ``local_path`` option reads the same JSON
row format from a file through the identical partition/parse code path
— the network call is the only thing swapped out.
"""

from __future__ import annotations

import datetime as dt
import json
import math
import urllib.parse
import urllib.request
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

DEFAULT_DOMAIN = "data.cityofnewyork.us"
DATASET_311 = "erm2-nwe9"

# Per-fiscal-year parking datasets (load_parking.py:11-23).
PARKING_DATASETS = {
    2014: "jt7v-77mi", 2015: "c284-tqph", 2016: "kiv2-tbus",
    2017: "2bnn-yakx", 2018: "a5td-mswe", 2019: "faiq-9dfq",
    2020: "p7t3-5i9s", 2021: "kvfd-bves", 2022: "7mxj-7a6y",
    2023: "869v-vr48", 2024: "pvqr-7yc4",
}
LATEST_FY = max(PARKING_DATASETS)
EARLIEST_FY = min(PARKING_DATASETS)


_IDENT_RE = None  # compiled lazily


def _soql_quote(value: str) -> str:
    """Single-quote a SoQL string literal, doubling embedded quotes.

    The reference interpolates raw strings into ``$where``
    (load_311.py:13) — a quote in the value breaks the query (SoQL
    injection). A connector need not reproduce that flaw."""
    return "'" + str(value).replace("'", "''") + "'"


def soql_window(column: str, start: str, end: str) -> str:
    """Half-open time-window predicate in SoQL (load_311.py:13).

    ``column`` must be a plain field identifier; start/end are quoted as
    SoQL string literals (embedded quotes escaped)."""
    global _IDENT_RE
    if _IDENT_RE is None:
        import re

        _IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    if not _IDENT_RE.match(column):
        raise ValueError(f"invalid SoQL column identifier: {column!r}")
    return f"{column} >= {_soql_quote(start)} AND {column} < {_soql_quote(end)}"


def yesterday_window(
    column: str = "created_date", today: dt.date | None = None
) -> str:
    """SoQL predicate for UTC "yesterday": the half-open day window
    ``[today-1 00:00, today 00:00)`` with millisecond-format bounds —
    the reference's daily-load convenience (``get_yesterdays_311_data``,
    load_311.py:20-24). ``today`` defaults to the current UTC date and
    is injectable so tests (and backfills) can pin the anchor."""
    if today is None:
        today = dt.datetime.now(dt.timezone.utc).date()
    start = f"{today - dt.timedelta(days=1)}T00:00:00.000"
    end = f"{today}T00:00:00.000"
    return soql_window(column, start, end)


def year_window(
    year: int, column: str = "created_date", limit: int = 500_000
) -> dict[str, str]:
    """Reader options for a calendar-year scan capped at 500k rows
    (``get_311_data_for_year``, load_311.py:27-30): the year bounds
    compile to a server-side ``$where`` and the cap to the paged
    reader's total limit, so Spark fans the capped scan out over
    ``limit / page_size`` partitions instead of one giant request."""
    where = soql_window(
        column,
        f"{year}-01-01T00:00:00.000",
        f"{year + 1}-01-01T00:00:00.000",
    )
    return {"where": where, "limit": str(limit)}


def fiscal_year_dataset(start: str) -> str | None:
    """Window start → parking dataset id (manual partition pruning,
    load_parking.py:40-47): month < 7 → year else year+1; pre-FY2014 →
    None (empty scan); future → clamped to latest."""
    start_dt = dt.datetime.strptime(start[:10], "%Y-%m-%d")
    fy = start_dt.year if start_dt.month < 7 else start_dt.year + 1
    if fy < EARLIEST_FY:
        return None
    return PARKING_DATASETS[min(fy, LATEST_FY)]


@dataclass
class _Page(InputPartition):
    offset: int
    limit: int


class SocrataReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.domain = options.get("domain", DEFAULT_DOMAIN)
        self.dataset = options.get("dataset", DATASET_311)
        self.where = options.get("where")
        # explicit option wins; else the config plumbing (NYC_API_TOKEN
        # env var / .env) supplies it, mirroring config/env.py:1-7
        self.token = options.get("app_token")
        if not self.token:
            from nyc_opendata_etl_spark.config import api_token

            self.token = api_token()
        self.local_path = options.get("local_path")
        self.total_limit = int(options.get("limit", 1_000_000))
        self.page_size = int(options.get("page_size", 50_000))

    def partitions(self):
        n = max(1, math.ceil(self.total_limit / self.page_size))
        return [
            _Page(i * self.page_size, min(self.page_size, self.total_limit - i * self.page_size))
            for i in range(n)
        ]

    def _fetch(self, offset: int, limit: int) -> list[dict]:
        if self.local_path:
            # offline mode: same row format, file-backed; page slicing
            # happens client-side through the identical code path.
            with open(self.local_path) as f:
                rows = json.load(f)
            if self.where:
                # local mode applies no predicate — callers filter in
                # Spark; the option is recorded for plan inspection.
                pass
            return rows[offset : offset + limit]
        params = {"$limit": str(limit), "$offset": str(offset), "$order": ":id"}
        if self.where:
            params["$where"] = self.where
        url = (
            f"https://{self.domain}/resource/{self.dataset}.json?"
            + urllib.parse.urlencode(params)
        )
        req = urllib.request.Request(url)
        if self.token:
            req.add_header("X-App-Token", self.token)
        with urllib.request.urlopen(req, timeout=60) as resp:
            return json.loads(resp.read())

    def read(self, partition: _Page):
        rows = self._fetch(partition.offset, partition.limit)
        names = self.schema.fieldNames()
        for row in rows:
            yield tuple(
                None if row.get(n) is None else str(row.get(n)) for n in names
            )


class SocrataDataSource(DataSource):
    """``spark.read.format("socrata")`` after
    ``spark.dataSource.register(SocrataDataSource)``.

    Options: dataset, where (SoQL), limit, page_size, app_token, domain,
    local_path (offline). Schema must be provided by the caller (Socrata
    JSON is stringly-typed; SURVEY §1.3 — downstream reconciliation
    handles drift).
    """

    @classmethod
    def name(cls) -> str:
        return "socrata"

    def schema(self):
        raise NotImplementedError(
            "socrata source requires an explicit schema (.schema(...))"
        )

    def reader(self, schema: StructType) -> SocrataReader:
        return SocrataReader(schema, self.options)
