"""Protobuf compatibility hook for transformWithState (M6b).

pyspark 4.1.2's transformWithState Python surface speaks a
protobuf-framed state-server protocol to the JVM (StateMessage.proto,
gencode pinned to protobuf 6.33). This sandbox has NO installed
protobuf distribution and installs are forbidden — but the baked
Google Cloud SDK ships a plain-namespace pure-Python protobuf
**6.32.0** under platform/google_appengine. 6.32 parses the 6.33
gencode fine (same major, proto3 wire format unchanged); only the
gencode's ValidateProtobufRuntimeVersion call rejects the one-minor
skew, so we make that check lenient for SAME-MAJOR skews only.

This file is a ``sitecustomize`` on purpose: Spark's Python workers
(the transformWithState driver worker and the executor-side state
clients) are separate interpreter processes spawned by the JVM; the
only pre-import code-execution hook they all honor is the standard
site mechanism. The directory containing this file is prepended to
PYTHONPATH by ``test_dataengineer2026_spark.pbcompat.ensure()`` —
nothing happens to interpreters launched without that env var.

Defensive by construction: every step is wrapped so that on any
surprise (SDK removed, a real protobuf appears, layout change) the
interpreter is left exactly as stock and the TWS query fails with the
ordinary missing-protobuf error instead of something mysterious.
"""

import importlib.util
import os
import sys

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _usable(name: str) -> bool:
    """True only for a REAL package: find_spec raises when even the
    parent "google" is absent, and — the trap that bit the Spark
    workers — spark-core's JAR sits on their sys.path and its bundled
    google/protobuf/*.proto resources form a phantom NAMESPACE package
    (spec with no origin, no code). Require a loadable origin."""
    try:
        spec = importlib.util.find_spec(name)
    except ModuleNotFoundError:
        return False
    return spec is not None and spec.origin is not None


def _install() -> None:
    if not _usable("google.protobuf"):
        if not os.path.isdir(os.path.join(_APPENGINE, "google", "protobuf")):
            return
        # APPEND, never prepend: a real distribution must always win.
        sys.path.append(_APPENGINE)
    try:
        from google.protobuf import runtime_version as _rv
    except Exception:
        return  # pre-runtime_version protobuf: nothing to relax
    _orig = _rv.ValidateProtobufRuntimeVersion

    def _lenient(domain, major, minor, patch, suffix, location):
        try:
            _orig(domain, major, minor, patch, suffix, location)
        except Exception:
            if int(major) != int(_rv.MAJOR):
                raise  # cross-major skew is a REAL incompatibility

    _rv.ValidateProtobufRuntimeVersion = _lenient


def _chain_next() -> None:
    """Python's site machinery imports only the FIRST ``sitecustomize``
    on sys.path — and pbcompat prepends this directory, so without help
    this shim would silently shadow any real system sitecustomize and
    whatever unrelated setup it performs (r16 review finding). Find the
    next ``sitecustomize`` on sys.path that is NOT this file and run it,
    so the system hook still executes."""
    import importlib.machinery
    import runpy

    here = os.path.dirname(os.path.abspath(__file__))
    for entry in sys.path:
        try:
            if os.path.abspath(entry or os.getcwd()) == here:
                continue
            spec = importlib.machinery.PathFinder.find_spec(
                "sitecustomize", path=[entry or os.getcwd()]
            )
            if spec is not None and spec.origin:
                runpy.run_path(spec.origin)
                return
        except Exception:
            continue  # a broken candidate must not break interpreter start


try:
    _install()
    # Chain only when the site machinery imported us as the module named
    # "sitecustomize" (fresh interpreter, system hook not yet run).
    # pbcompat.ensure() replays this file via runpy into an ALREADY
    # site-initialized process (__name__ == "<run_path>") — chaining
    # there would run the system sitecustomize a second time.
    if __name__ == "sitecustomize":
        _chain_next()
except Exception:
    pass
