"""S21: the SimpleDataSourceStreamReader manifest source
(test_dataengineer2026_spark/sources/manifest_source.py).

Two layers: pure offset algebra (no Spark), then the end-to-end
exactly-once restart through a live session with a parquet sink (the
memory sink does not support checkpoint recovery, so the restart pin
must use a real one).
"""

from __future__ import annotations

import json
import os

import pytest

from test_dataengineer2026_spark.sources.manifest_source import (
    DocManifestDataSource,
    ManifestSimpleStreamReader,
)


def _append(path, *recs):
    with open(path, "a") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")


def _rec(i, lang="es"):
    return {"doc_id": i, "lang": lang, "n_chars": 100 + i}


# ------------------------------------------------------------ offset algebra


def test_read_returns_rows_and_next_offset(tmp_path):
    mf = str(tmp_path / "m.jsonl")
    _append(mf, _rec(0), _rec(1), _rec(2))
    r = ManifestSimpleStreamReader({"path": mf})
    assert r.initialOffset() == {"line": 0}

    rows, end = r.read({"line": 0})
    assert list(rows) == [(0, "es", 100), (1, "es", 101), (2, "es", 102)]
    assert end == {"line": 3}

    # nothing new: empty batch, offset unchanged
    rows2, end2 = r.read(end)
    assert list(rows2) == [] and end2 == {"line": 3}

    _append(mf, _rec(3, "en"))
    rows3, end3 = r.read(end)
    assert list(rows3) == [(3, "en", 103)] and end3 == {"line": 4}


def test_partial_trailing_line_is_invisible(tmp_path):
    """A writer mid-append leaves a partial last line; offsets must only
    ever cover complete records, and the record becomes visible once
    the newline lands."""
    mf = str(tmp_path / "m.jsonl")
    _append(mf, _rec(0))
    with open(mf, "a") as fh:
        fh.write('{"doc_id": 1, "lang": "es"')  # no newline: incomplete
    r = ManifestSimpleStreamReader({"path": mf})
    rows, end = r.read({"line": 0})
    assert list(rows) == [(0, "es", 100)] and end == {"line": 1}

    with open(mf, "a") as fh:
        fh.write(', "n_chars": 101}\n')  # record completes
    rows2, end2 = r.read(end)
    assert list(rows2) == [(1, "es", 101)] and end2 == {"line": 2}


def test_read_between_offsets_replays_exact_range(tmp_path):
    """Failure-recovery contract: a committed (start, end) range must
    replay byte-identically even after MORE lines landed — append-only
    files make the range a pure slice."""
    mf = str(tmp_path / "m.jsonl")
    _append(mf, *[_rec(i) for i in range(5)])
    r = ManifestSimpleStreamReader({"path": mf})
    first = list(r.readBetweenOffsets({"line": 1}, {"line": 4}))
    _append(mf, _rec(99, "en"))  # late landing must not change the replay
    again = list(r.readBetweenOffsets({"line": 1}, {"line": 4}))
    assert first == again == [(1, "es", 101), (2, "es", 102), (3, "es", 103)]


def test_missing_or_empty_manifest_reads_empty(tmp_path):
    r = ManifestSimpleStreamReader({"path": str(tmp_path / "absent.jsonl")})
    rows, end = r.read({"line": 0})
    assert list(rows) == [] and end == {"line": 0}
    with pytest.raises(ValueError):
        ManifestSimpleStreamReader({})


# ---------------------------------------------------------------- end to end


def test_exactly_once_across_restarts(spark, tmp_path):
    """Run 1 (availableNow) consumes 5 manifest lines; 3 more land; run
    2 on the SAME checkpoint emits ONLY the new 3 — the offset log +
    line-count offsets give exactly-once without any source-side
    bookkeeping."""
    spark.dataSource.register(DocManifestDataSource)
    mf = str(tmp_path / "manifest.jsonl")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        s = spark.readStream.format("docmanifest").load(mf)
        q = (
            s.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    _append(mf, *[_rec(i) for i in range(5)])
    run_once()
    assert spark.read.parquet(sink).count() == 5

    _append(mf, *[_rec(i, "en") for i in range(5, 8)])
    run_once()
    back = spark.read.parquet(sink)
    assert back.count() == 8  # 5 + 3: no replays, no drops
    got = sorted((r["doc_id"], r["lang"], r["n_chars"]) for r in back.collect())
    want = sorted(
        [(i, "es", 100 + i) for i in range(5)]
        + [(i, "en", 100 + i) for i in range(5, 8)]
    )
    assert got == want


def test_shrunk_manifest_never_regresses_offset(tmp_path):
    """Contract violation handled safely: if the append-only manifest
    SHRANK (truncated/replaced), read(start) must return an empty batch
    at the old watermark — a regressing end offset would corrupt
    Spark's offset log."""
    mf = str(tmp_path / "m.jsonl")
    _append(mf, *[_rec(i) for i in range(5)])
    r = ManifestSimpleStreamReader({"path": mf})
    _rows, end = r.read({"line": 0})
    assert end == {"line": 5}

    with open(mf, "w") as fh:  # truncate to 2 records
        pass
    _append(mf, _rec(0), _rec(1))
    rows2, end2 = r.read(end)
    assert list(rows2) == [] and end2 == {"line": 5}  # held, not regressed
