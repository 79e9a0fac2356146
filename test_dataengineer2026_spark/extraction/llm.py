"""LLM-assisted extraction interface (X10 — the optional path the spec
explicitly allows, TEST_TECNICO_INGENIERO_DATOS.md:86-99; SURVEY.md §4.3).

The Spark-side plumbing is real and production-shaped:

* **Arrow-batched ``mapInPandas``** over (doc_id, text) — one Python
  worker per partition, so 10k PDFs fan out across executors exactly
  like the X1 parser; no driver involvement, no ``collect``.
* **Prompt batching** — documents are grouped into ``batch_size``
  prompts per backend call (real endpoints bill and rate-limit per
  request; batching amortizes both).
* **Retry with exponential backoff** on ``TransientBackendError``
  (TEST.md:161 error handling) and an optional inter-call sleep as a
  naive rate limiter.
* **Null-contract error handling**: a completion that is not valid JSON
  degrades to an all-null metadata row for that document — the row is
  kept, never dropped (TEST.md:30).

The backend is an interface (``complete: list[prompt] -> list[raw
completion]``) so a real HTTP client is ONE constructor swap away.  No
network client ships here (none is available in this environment);
``DeterministicRegexBackend`` re-implements the X3 regex contract in
pure Python and answers through the same prompt/JSON-completion
round-trip a hosted model would use, which keeps the whole path
value-comparable with the deterministic extractor — the spec's own
"validate the LLM output" suggestion (TEST.md:97).
"""

from __future__ import annotations

import datetime as _dt
import json
import re
import time
from collections.abc import Callable, Iterable, Iterator
from typing import Protocol

from pyspark.sql import DataFrame

PROJECTS_SCHEMA = (
    "doc_id string, project_name string, company string, "
    "country string, region string, report_date date"
)
_FIELDS = ("project_name", "company", "country", "region", "report_date")

_PROMPT_TEMPLATE = (
    "Extract the project metadata from the NI 43-101 technical report "
    "text below. Respond with ONLY a JSON object with keys "
    '"project_name", "company", "country", "region", "report_date" '
    "(ISO date), using null for anything the text does not state.\n"
    "<document>\n{text}\n</document>"
)
_DOC_RE = re.compile(r"<document>\n(.*)\n</document>", re.S)


def build_prompt(text: str) -> str:
    return _PROMPT_TEMPLATE.format(text=text)


class TransientBackendError(RuntimeError):
    """Retryable failure (rate limit, timeout, 5xx)."""


class LLMBackend(Protocol):
    def complete(self, prompts: list[str]) -> list[str]:
        """One raw completion string per prompt, in order."""
        ...


# Python mirrors of the X3 Spark regexes (extract.py:93-122). Same
# pattern source text; `re.search` == Java regexp_extract first-match.
_TITLE_RE = re.compile(
    r"Technical Report for the ([A-Z][A-Za-z ]+?(?:Operations|Project|Mine))"
)
_COMPANY_RE = re.compile(
    r"([A-Z][A-Za-z]+(?: [A-Z][A-Za-z]+)* (?:Corporation|Corp|Inc|Ltd|SA|Mining))"
)
_REGION_RE = re.compile(
    r"(?:Operations|Project|Mine), ([A-Z][a-zA-Z]+), [A-Z][a-zA-Z]+"
)
_COUNTRY_RE = re.compile(
    r"(?:Operations|Project|Mine), [A-Z][a-zA-Z]+, ([A-Z][a-zA-Z]+)"
)
_EFF_DATE_RE = re.compile(
    r"effective (January|February|March|April|May|June|July|August|"
    r"September|October|November|December) ([0-9]{1,2}), ([0-9]{4})"
)
_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        "January February March April May June July August September "
        "October November December".split()
    )
}


def _first(rx: re.Pattern[str], text: str) -> str | None:
    m = rx.search(text)
    return m.group(1) if m else None


class DeterministicRegexBackend:
    """Offline stand-in for a hosted model: answers every prompt with
    the JSON the X3 regex contract implies. Deterministic, so the X10
    query is DuckDB-oracle-checkable with X3's own oracle SQL."""

    def complete(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            m = _DOC_RE.search(p)
            text = m.group(1) if m else ""
            d = _EFF_DATE_RE.search(text)
            date = (
                _dt.date(int(d.group(3)), _MONTHS[d.group(1)], int(d.group(2))).isoformat()
                if d
                else None
            )
            out.append(
                json.dumps(
                    {
                        "project_name": _first(_TITLE_RE, text),
                        "company": _first(_COMPANY_RE, text),
                        "country": _first(_COUNTRY_RE, text),
                        "region": _first(_REGION_RE, text),
                        "report_date": date,
                    }
                )
            )
        return out


class FlakyBackend:
    """Test double: the first ``fail_times`` calls raise a retryable
    error, then delegate — exercises the retry/backoff path."""

    def __init__(self, inner: LLMBackend | None = None, fail_times: int = 1):
        self.inner = inner or DeterministicRegexBackend()
        self.fail_times = fail_times
        self.calls = 0

    def complete(self, prompts: list[str]) -> list[str]:
        self.calls += 1
        if self.calls <= self.fail_times:
            raise TransientBackendError(f"simulated transient failure #{self.calls}")
        return self.inner.complete(prompts)


class HostedLLMBackend:
    """Placeholder for a real endpoint client. Intentionally NOT
    implemented: this environment has no network access, and shipping a
    dead HTTP client would be padding. A real deployment implements
    ``complete`` with its provider SDK; everything else in this module
    (batching, retry, rate limit, Spark plan) is already production
    code."""

    def __init__(self, *a: object, **kw: object):
        raise NotImplementedError(
            "no hosted LLM endpoint in this environment; use "
            "DeterministicRegexBackend or supply your own backend"
        )


def _complete_with_retry(
    backend: LLMBackend,
    prompts: list[str],
    max_retries: int,
    backoff_s: float,
) -> list[str]:
    for attempt in range(max_retries + 1):
        try:
            return backend.complete(prompts)
        except TransientBackendError:
            if attempt == max_retries:
                raise
            if backoff_s:
                time.sleep(backoff_s * (2**attempt))
    raise AssertionError("unreachable")


def _parse_completion(doc_id: object, raw: str) -> dict[str, object]:
    row: dict[str, object] = {"doc_id": str(doc_id)}
    try:
        obj = json.loads(raw)
        if not isinstance(obj, dict):
            raise ValueError("completion is not a JSON object")
    except (ValueError, TypeError):
        # Null contract (TEST.md:30): keep the row, null the fields.
        obj = {}
    for f in _FIELDS[:-1]:
        v = obj.get(f)
        row[f] = str(v) if v is not None else None
    d = obj.get("report_date")
    try:
        row["report_date"] = _dt.date.fromisoformat(d) if d else None
    except (ValueError, TypeError):
        row["report_date"] = None
    return row


def llm_extract_metadata(
    docs: DataFrame,
    backend_factory: Callable[[], LLMBackend] = DeterministicRegexBackend,
    batch_size: int = 8,
    max_retries: int = 3,
    backoff_s: float = 0.0,
    min_interval_s: float = 0.0,
) -> DataFrame:
    """(doc_id, text) -> projects rows via the LLM path.

    ``backend_factory`` (not an instance) is shipped to executors so
    each Python worker builds its own client — the standard pattern for
    non-picklable connections.
    """
    import pandas as pd

    cols = ("doc_id",) + _FIELDS

    def run(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        backend = backend_factory()
        for pdf in batches:
            rows = []
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                prompts = [build_prompt(t) for t in chunk["text"]]
                raws = _complete_with_retry(backend, prompts, max_retries, backoff_s)
                rows.extend(
                    _parse_completion(d, r) for d, r in zip(chunk["doc_id"], raws)
                )
                if min_interval_s:
                    time.sleep(min_interval_s)
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id", "text").mapInPandas(run, PROJECTS_SCHEMA)
