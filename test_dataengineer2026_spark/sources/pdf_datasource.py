"""A first-class pluggable PDF-corpus source/sink on Spark 4's Python
DataSource API (``pyspark.sql.datasource``, added 4.0) — S18.

Reference basis: the spec's input is a corpus of PDF reports
(TEST.md:26-34) and its production posture demands a maintainable
ingestion component (TEST.md:158-163). Until now the repo ingested PDFs
as ``binaryFile`` scans composed with Arrow-batched extraction UDFs
(X1, queries/extraction_q.py); this module packages the same pure-stdlib
extractor (extraction/pdf.py) behind ``spark.read.format("pdfcorpus")``
— the API a platform team would actually hand its users, with partition
planning, task-level parallel writes, and a two-phase commit, all in
the engine's own source/sink protocol instead of ad-hoc composition.

Execution model (and the 100 TB posture):

* ``partitions()`` runs ONCE on the driver and only LISTS file names —
  no bytes are read at plan time. Files are chunked into
  ``filesPerPartition``-sized :class:`InputPartition`\\ s, so a
  10M-file corpus fans out across every executor while keeping tasks
  coarse enough to amortize interpreter startup.
* ``read()`` runs per partition on executors: open file → pure-Python
  page extraction → yield tuples. Nothing is collected to the driver.
* The writer is the textbook two-phase commit: tasks write PDFs under
  hidden ``.part-*`` temp names and report them in commit messages; the
  driver's ``commit()`` promotes temps to final names with ``os.replace``
  (atomic per file) only after EVERY task succeeded, and ``abort()``
  removes temps — a half-failed job leaves no visible file. Overwrite
  mode clears prior finals inside ``commit()``, not at plan time, so a
  failed overwrite never destroys existing data.

Local-FS caveat, stated honestly: final-name promotion is atomic per
file, not per job — a reader listing mid-commit can see a prefix of the
new corpus (the ``_SUCCESS`` marker is the ordinary convention for
gating that). On a real object store the same protocol maps to
multipart-upload + manifest commit.
"""

from __future__ import annotations

import glob
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

#: Reader output schema. ``doc_id`` comes from the file name stem (the
#: writer names files ``<doc_id>.pdf``), pages from the extractor.
SCHEMA = "doc_id BIGINT, page INT, text STRING"

DEFAULT_FILES_PER_PARTITION = 64


@dataclass
class PdfFilesPartition(InputPartition):
    """One reader task's worth of PDF file paths (picklable)."""

    files: List[str]


@dataclass
class PdfCommit(WriterCommitMessage):
    """One write task's (temp_path, final_path) promotions (picklable)."""

    renames: List[Tuple[str, str]]


class PdfCorpusReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pdfcorpus: .load(path) requires a directory path")
        self.files_per_partition = int(
            options.get("filesperpartition", DEFAULT_FILES_PER_PARTITION)
        )
        if self.files_per_partition <= 0:
            raise ValueError("pdfcorpus: filesPerPartition must be positive")

    def partitions(self) -> Sequence[InputPartition]:
        """Driver-side plan: list (never read) ``*.pdf``, chunk into
        fixed-size partitions. Sorted so the plan is deterministic.
        Hidden temp names (``.part-*``) never match the glob, so a
        concurrent in-flight write is invisible — the commit protocol's
        read-side half."""
        files = sorted(glob.glob(os.path.join(self.path, "*.pdf")))
        k = self.files_per_partition
        return [PdfFilesPartition(files[i : i + k]) for i in range(0, len(files), k)]

    def read(self, partition: PdfFilesPartition) -> Iterator[Tuple]:
        # Import inside the task: this body runs in executor Python
        # workers, and the extractor is pure stdlib (no native deps).
        from test_dataengineer2026_spark.extraction.pdf import extract_pages

        for f in partition.files:
            doc_id = int(os.path.splitext(os.path.basename(f))[0])
            with open(f, "rb") as fh:
                data = fh.read()
            for page, text in extract_pages(data):
                yield (doc_id, page, text)


class PdfCorpusWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pdfcorpus: .save(path) requires a directory path")
        self.overwrite = overwrite

    def write(self, rows: Iterator[Row]) -> PdfCommit:
        """Task-side: render each (doc_id, text) row into a real PDF
        under a hidden temp name; promotion happens only in commit()."""
        from test_dataengineer2026_spark.extraction.pdf import render_pdf

        os.makedirs(self.path, exist_ok=True)
        task_tag = uuid.uuid4().hex
        renames: List[Tuple[str, str]] = []
        for row in rows:
            final = os.path.join(self.path, f"{int(row['doc_id'])}.pdf")
            tmp = os.path.join(
                self.path, f".part-{task_tag}-{len(renames)}.pdf.tmp"
            )
            with open(tmp, "wb") as fh:
                fh.write(render_pdf(row["text"]))
            renames.append((tmp, final))
        return PdfCommit(renames=renames)

    def commit(self, messages: List[Optional[PdfCommit]]) -> None:
        """Driver-side job commit: clear stale finals (overwrite mode),
        then promote every task's temps atomically, then drop the
        ``_SUCCESS`` marker. Runs only after ALL tasks succeeded."""
        new_finals = {f for m in messages if m for _, f in m.renames}
        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "*.pdf")):
                if old not in new_finals:
                    os.remove(old)
        for m in messages:
            if m is None:
                continue
            for tmp, final in m.renames:
                os.replace(tmp, final)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages: List[Optional[PdfCommit]]) -> None:
        """Remove temps; never touches a visible final file."""
        for m in messages:
            if m is None:
                continue
            for tmp, _final in m.renames:
                try:
                    os.remove(tmp)
                except OSError:
                    pass


class PdfCorpusDataSource(DataSource):
    """``spark.dataSource.register(PdfCorpusDataSource)`` →
    ``spark.read.format("pdfcorpus")`` / ``df.write.format("pdfcorpus")``."""

    @classmethod
    def name(cls) -> str:
        return "pdfcorpus"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> PdfCorpusReader:
        return PdfCorpusReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> PdfCorpusWriter:
        names = set(schema.fieldNames())
        if not {"doc_id", "text"} <= names:
            raise ValueError(
                f"pdfcorpus sink needs doc_id + text columns, got {sorted(names)}"
            )
        return PdfCorpusWriter(self.options, overwrite)
