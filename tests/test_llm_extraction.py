"""X10 LLM-assisted extraction path (extraction/llm.py): equivalence
with the deterministic regex path, retry/backoff behavior, and the
null contract for malformed completions (TEST.md:86-99, :161, :30)."""

from __future__ import annotations

import pytest

from test_dataengineer2026_spark.extraction import extract as X
from test_dataengineer2026_spark.extraction.llm import (
    DeterministicRegexBackend,
    FlakyBackend,
    TransientBackendError,
    _complete_with_retry,
    build_prompt,
    llm_extract_metadata,
)
from test_dataengineer2026_spark.queries.extraction_q import _corpus_df


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_llm_path_matches_regex_path(spark):
    corpus = _corpus_df(spark)
    regex_rows = _rows(X.extract_metadata(corpus))
    llm_rows = _rows(llm_extract_metadata(corpus, batch_size=2))
    assert llm_rows == regex_rows
    assert len(llm_rows) == 3


def test_llm_retry_recovers_from_transient_failures(spark):
    corpus = _corpus_df(spark)
    base = _rows(X.extract_metadata(corpus))
    # Factory builds a backend whose first 2 calls fail; with
    # max_retries=3 every batch still succeeds.
    got = _rows(
        llm_extract_metadata(
            corpus,
            backend_factory=lambda: FlakyBackend(fail_times=2),
            batch_size=8,
            max_retries=3,
        )
    )
    assert got == base


def test_llm_retries_exhausted_raises():
    backend = FlakyBackend(fail_times=10)
    with pytest.raises(TransientBackendError):
        _complete_with_retry(backend, ["p"], max_retries=2, backoff_s=0.0)
    assert backend.calls == 3  # initial try + 2 retries


def test_malformed_completion_keeps_row_with_nulls(spark):
    class GarbageBackend:
        def complete(self, prompts):
            return ["this is not JSON"] * len(prompts)

    out = llm_extract_metadata(
        _corpus_df(spark), backend_factory=GarbageBackend
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r.doc_id
        assert r.project_name is None and r.report_date is None


def test_prompt_embeds_document_and_backend_answers_json():
    import json

    raw = DeterministicRegexBackend().complete(
        [build_prompt("Technical Report for the Alpha One Project, Antioquia, Colombia")]
    )[0]
    obj = json.loads(raw)
    assert obj["project_name"] == "Alpha One Project"
    assert obj["country"] == "Colombia"
    assert obj["region"] == "Antioquia"
