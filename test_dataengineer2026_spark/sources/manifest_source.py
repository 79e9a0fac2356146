"""S21: a document-manifest stream on ``SimpleDataSourceStreamReader``
— the THIRD (and last untouched) reader surface of Spark 4's Python
DataSource API, completing the set: batch ``DataSourceReader`` (S18),
partition-planned ``DataSourceStreamReader`` (S19), and this
driver-side simple stream reader.

Reference basis: the spec's production posture wants an auditable
record of what entered the corpus (TEST.md:158-163); a landing-zone
MANIFEST — one JSONL line per registered document — is that record,
and tailing it is a control-plane feed: tiny rows, low rate, but it
must be exactly-once into downstream bookkeeping.

Why the SIMPLE reader here (and not in S19): this API reads ON THE
DRIVER with no partition planning — Spark's own docstring scopes it to
"lightweight use cases where input rate and batch size is small". A
manifest tail is exactly that (the PDFs themselves stream through the
partitioned S19 reader; only their registration records flow here).
The wrapper Spark puts around a simple reader prefetches each batch at
``latestOffset`` time and caches it, so the cost model is: one file
tail per trigger, zero executor involvement until the rows enter the
plan.

Offsets are line counts over an append-only JSONL file:

* ``initialOffset`` -> ``{"line": 0}``;
* ``read(start)`` tails every complete line past ``start`` and returns
  ``(rows, {"line": new_total})`` — reading and offset planning in one
  call, the API's signature feature;
* ``readBetweenOffsets(start, end)`` re-reads the half-open line range
  deterministically — Spark calls it on failure recovery, so a
  replayed batch is byte-identical (append-only files make this a pure
  slice);
* ``commit`` is a no-op: the manifest itself is the durable log.

At 100 TB the manifest is still small (one line per document, not per
byte), but if it ever outgrew a driver tail the upgrade path is the
S19-style partition-planned reader — same offset algebra, executor
fan-out.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

#: Manifest record layout (field order = tuple order yielded by read).
SCHEMA = "doc_id BIGINT, lang STRING, n_chars BIGINT"
_FIELDS = ("doc_id", "lang", "n_chars")


def _read_lines(path: str) -> list:
    """All complete lines of the manifest (a trailing partial line —
    a writer mid-append — is excluded so offsets only ever cover
    complete records)."""
    if not os.path.exists(path):
        return []
    with open(path, "rb") as fh:
        data = fh.read()
    if not data:
        return []
    complete, sep, _partial = data.rpartition(b"\n")
    if not sep:
        return []  # a single partial line, no complete record yet
    return complete.decode("utf-8").split("\n")


def _to_row(line: str) -> Tuple:
    rec = json.loads(line)
    return tuple(rec.get(f) for f in _FIELDS)


class ManifestSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("docmanifest: .load(path) requires a manifest file")

    def initialOffset(self) -> dict:
        return {"line": 0}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        lines = _read_lines(self.path)
        lo = start["line"]
        # Never regress the offset: a manifest that SHRANK (truncated or
        # replaced — a contract violation, the log is append-only) must
        # not hand Spark an end offset below the committed start; emit
        # an empty batch at the old watermark instead of corrupting the
        # offset log.
        return (
            iter([_to_row(ln) for ln in lines[lo:]]),
            {"line": max(lo, len(lines))},
        )

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        lines = _read_lines(self.path)
        return iter([_to_row(ln) for ln in lines[start["line"] : end["line"]]])

    def commit(self, end: dict) -> None:
        pass  # the manifest file is the durable log; nothing to ack


class DocManifestDataSource(DataSource):
    """``spark.dataSource.register(DocManifestDataSource)`` →
    ``spark.readStream.format("docmanifest").load(manifest_path)``."""

    @classmethod
    def name(cls) -> str:
        return "docmanifest"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema: StructType) -> ManifestSimpleStreamReader:
        return ManifestSimpleStreamReader(self.options)
