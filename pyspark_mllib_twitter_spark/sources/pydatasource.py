"""Custom connector via the Spark 4 Python Data Source API.

``DocGenDataSource`` is a deterministic synthetic-document SOURCE — the
engine's demonstration of the public ``pyspark.sql.datasource`` connector
surface (batch read path: ``DataSource`` / ``DataSourceReader`` /
``InputPartition``). Generation is a pure function of ``doc_id`` built
from md5 hex characters, so a SQL oracle can replay every row bit-for-bit
(the same portability trick as the md5 MinHash family).

Scale shape: the reader splits the id range into ``partitions`` input
partitions; each executor generates only its slice — no driver
materialization, no shuffle. A production connector (REST API, Kafka
admin, proprietary store) has exactly this skeleton: plan partitions
driver-side, read each partition executor-side.

Row recipe (mirrored in the DuckDB oracle at plans/relational.py):

- ``n_tokens(i) = 5 + (hexval(md5(str(i) + "|0")[0]) % 10)``
- ``token(i, j) = VOCAB[hexval(md5(str(i) + "|" + str(j))[0])]``
  for ``j`` in ``1..n_tokens`` (16-word VOCAB — one hex char indexes it
  exactly), joined with single spaces.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

#: 16 words so one md5 hex character indexes the vocabulary exactly.
VOCAB: Sequence[str] = (
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
)


def _hexval(s: str) -> int:
    """First hex character of md5(s) as an int in 0..15."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[0], 16)


def doc_text(doc_id: int) -> str:
    """The deterministic text of document ``doc_id`` (shared with tests)."""
    n_tokens = 5 + (_hexval(f"{doc_id}|0") % 10)
    return " ".join(
        VOCAB[_hexval(f"{doc_id}|{j}")] for j in range(1, n_tokens + 1)
    )


class DocGenReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        """Driver-side planning only: id ranges, one per input partition."""
        step = max(1, -(-self.n // self.num_partitions))
        return [
            InputPartition((start, min(start + step, self.n)))
            for start in range(0, self.n, step)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        start, end = partition.value
        for i in range(start, end):
            yield (i, doc_text(i))


class DocGenDataSource(DataSource):
    """``spark.read.format("docgen").option("n", 500).load()``"""

    @classmethod
    def name(cls) -> str:
        return "docgen"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> DocGenReader:
        return DocGenReader(self.options)

    def streamReader(self, schema) -> "DocGenStreamReader":
        return DocGenStreamReader(self.options)


class DocGenStreamReader(DataSourceStreamReader):
    """STREAMING read path of the same connector: explicit offset protocol
    (``initialOffset`` → ``latestOffset`` → ``partitions(start, end)`` →
    executor-side ``read`` → ``commit``). The corpus is static, so
    ``latestOffset`` pins at ``n`` and an availableNow run drains it in one
    planned batch; a live source would instead advance the offset as data
    arrives and Spark would re-plan partitions every micro-batch — the
    per-batch planning hook is exactly what this class exercises. Offsets
    are plain dicts (the API json-serializes them into the checkpoint's
    offset log, which is what makes the stream restartable)."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 4))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        return {"pos": self.n}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        s, e = int(start["pos"]), int(end["pos"])
        if e <= s:
            return [InputPartition((s, s))]
        step = max(1, -(-(e - s) // self.num_partitions))
        return [
            InputPartition((a, min(a + step, e))) for a in range(s, e, step)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        start, end = partition.value
        for i in range(start, end):
            yield (i, doc_text(i))

    def commit(self, end: dict) -> None:
        pass  # nothing to release — generation is stateless


def register(spark) -> None:
    """Idempotent registration on a session (re-registering is harmless)."""
    spark.dataSource.register(DocGenDataSource)
