"""The reference's HTTP enrichment source (``etl.py:116-152``, S3) as
a Spark 4 Python DataSource — the fully Spark-native form of a custom
source: ``spark.read.format("omdb_lookup").option("path", movies_csv)``
yields the OMDb-shaped lookup table (schema ``schemas.OMDB_LOOKUP``)
that ``enrichment.enrich`` consumes via the ordered-fallback join.

Why a DataSource and not a UDF loop: partition planning, schema, and
task retry become the engine's job; each input partition covers a row
range of the movies CSV, so fetch work scales out with the cluster
and the 0.5 s/request pacing (``etl.py:29``) applies per executor
slot, not globally — the distributed analogue of the reference's
sequential rate-limited loop.

Offline by default: ``mode=stub`` (the default) synthesizes a
deterministic OMDb-shaped record per probe with a ~90% hit rate —
the reference's published match rate (``README.md:145``) — so the
whole enrichment path is testable with zero network. ``mode=http``
performs real requests (requests import gated; retry ×2, 1 s backoff,
10 s timeout — ``etl.py:30,133,149``) and needs ``api_key``.
"""

from __future__ import annotations

import csv
import zlib
from typing import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA_DDL = (
    "lookup_title string, lookup_year int, imdb_id string, plot string, "
    "director string, box_office string, runtime string, imdb_rating double"
)

_STUB_DIRECTORS = [
    "Lee Chang-dong", "Agnes Varda", "Sidney Lumet", "Mira Nair",
    "Billy Wilder", "Chantal Akerman", "Satyajit Ray", "Ida Lupino",
]


class _RowRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _stub_record(title: str, year: int | None):
    """Deterministic OMDb-shaped record: a pure function of the probe
    key, so any engine/partitioning/run produces identical rows. ~10%
    of probes miss (return None) to mirror the reference's cascade."""
    h = zlib.crc32(f"{title}|{year}".encode("utf-8"))
    if h % 10 == 0:  # deterministic miss
        return None
    return (
        title,
        year,
        f"tt{h % 10_000_000:07d}",
        f"Plot of {title}.",
        _STUB_DIRECTORS[h % len(_STUB_DIRECTORS)],
        f"${(h % 400 + 1) * 250_000:,}",
        f"{80 + h % 100} min",
        round(4.0 + (h % 60) / 10.0, 1),
    )


class OmdbLookupReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("omdb_lookup requires option 'path' (movies CSV)")
        self.mode = options.get("mode", "stub")
        self.api_key = options.get("api_key")
        self.num_partitions = int(options.get("numpartitions", 8))
        self.rate_limit_s = float(options.get("ratelimits", 0.5))
        # overridable endpoint/latency knobs so live-mode semantics are
        # testable against a 127.0.0.1 loopback server (no network);
        # defaults are the reference's (etl.py:28-30)
        self.base_url = options.get("base_url", "https://www.omdbapi.com/")
        self.backoff_s = float(options.get("backoffs", 1.0))
        self.timeout_s = float(options.get("timeouts", 10.0))
        if self.mode == "http" and not self.api_key:
            raise ValueError("mode=http requires option 'api_key'")

    def partitions(self) -> Sequence[InputPartition]:
        with open(self.path, newline="", encoding="utf-8") as fh:
            n = sum(1 for _ in fh) - 1  # minus header
        n = max(n, 0)
        per = max(1, (n + self.num_partitions - 1) // self.num_partitions)
        return [
            _RowRange(start, min(start + per, n))
            for start in range(0, n, per)
        ] or [_RowRange(0, 0)]

    def _probes(self, part: _RowRange):
        """(title_candidate, year_or_None) probe keys for this row
        range — the same candidate cascade the join side explodes
        (etl.py:123-146), deduped within the partition."""
        import re

        from ..functions.titles import _candidates_py

        seen = set()
        with open(self.path, newline="", encoding="utf-8") as fh:
            reader = csv.DictReader(fh)
            for i, row in enumerate(reader):
                if i < part.start or i >= part.end:
                    continue
                raw = row.get("title") or ""
                m = re.search(r"\((\d{4})\)", raw)
                year = int(m.group(1)) if m else None
                for cand in _candidates_py(raw):
                    for y in ([year, None] if year is not None else [None]):
                        key = (cand, y)
                        if key not in seen:
                            seen.add(key)
                            yield key

    def read(self, partition: _RowRange) -> Iterator[tuple]:
        if self.mode == "stub":
            for title, year in self._probes(partition):
                rec = _stub_record(title, year)
                if rec is not None:
                    yield rec
            return
        # mode=http — live fetch, partition-local pacing and retry
        import time

        import requests

        for title, year in self._probes(partition):
            params = {"t": title, "type": "movie", "apikey": self.api_key}
            if year is not None:
                params["y"] = str(year)
            data = None
            for attempt in range(2):  # retry ×2 (etl.py:30)
                try:
                    resp = requests.get(
                        self.base_url, params=params, timeout=self.timeout_s
                    )
                    data = resp.json()
                    break
                except Exception:
                    time.sleep(self.backoff_s)  # backoff (etl.py:149)
            time.sleep(self.rate_limit_s)
            if not data or data.get("Response") != "True":
                continue
            rating = data.get("imdbRating")
            yield (
                title,
                year,
                data.get("imdbID"),
                data.get("Plot", "Not Available"),
                data.get("Director", "Unknown"),
                data.get("BoxOffice"),
                data.get("Runtime"),
                float(rating) if rating not in (None, "N/A") else None,
            )


class OmdbLookupDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "omdb_lookup"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> OmdbLookupReader:
        return OmdbLookupReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(OmdbLookupDataSource)
