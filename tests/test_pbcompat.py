"""pbcompat (the M6b transformWithState protobuf shim): the sandbox has
no protobuf install, so ensure() wires in the baked Cloud SDK's
pure-Python protobuf 6.32 and relaxes the gencode version check for
same-major skew only. See pbcompat/sitecustomize.py for the worker-side
story (spark-core's JAR on worker sys.path forms a phantom namespace
google.protobuf that must not count as a runtime)."""

from __future__ import annotations

import importlib.machinery
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_dataengineer2026_spark import pbcompat


def test_ensure_makes_protobuf_importable():
    assert pbcompat.ensure() is True
    import google.protobuf as gp

    # a REAL package (file-backed), not the spark-core JAR's phantom
    # namespace portion
    assert gp.__file__ is not None
    from pyspark.sql.streaming.proto import StateMessage_pb2 as sm

    req = sm.StateRequest()
    req.version = 3
    out = sm.StateRequest()
    out.ParseFromString(req.SerializeToString())
    assert out.version == 3


def test_pythonpath_exported_for_workers():
    pbcompat.ensure()
    here = os.path.dirname(os.path.abspath(pbcompat.__file__))
    assert here in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    assert os.path.isfile(os.path.join(here, "sitecustomize.py"))


def test_lenient_validator_same_major_only():
    """The shim must tolerate 6.33-gencode on the 6.32 runtime but keep
    rejecting a CROSS-major skew — that one is a real wire/API break."""
    pbcompat.ensure()
    from google.protobuf import runtime_version as rv

    # same-major, newer-minor gencode: must not raise (this is exactly
    # pyspark 4.1.2's StateMessage.proto pin)
    rv.ValidateProtobufRuntimeVersion(
        rv.Domain.PUBLIC, rv.MAJOR, rv.MINOR + 1, 0, "", "x.proto"
    )
    with pytest.raises(Exception):
        rv.ValidateProtobufRuntimeVersion(
            rv.Domain.PUBLIC, rv.MAJOR + 1, 0, 0, "", "x.proto"
        )


def test_available_rejects_namespace_spec(monkeypatch):
    """The bug the Spark workers hit: find_spec returns a NAMESPACE
    spec (origin=None) for the google/protobuf resource dir inside
    spark-core's JAR. available() must not count that as a runtime."""
    ns_spec = importlib.machinery.ModuleSpec("google.protobuf", None)
    assert ns_spec.origin is None
    monkeypatch.setattr(
        pbcompat.importlib.util, "find_spec", lambda name: ns_spec
    )
    assert pbcompat.available() is False


def test_sitecustomize_in_fresh_interpreter():
    """What a Spark Python worker does at startup, end to end: a fresh
    interpreter with the pbcompat dir on PYTHONPATH must be able to
    import pyspark's TWS gencode with no in-process setup."""
    here = os.path.dirname(os.path.abspath(pbcompat.__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "from pyspark.sql.streaming.proto import StateMessage_pb2 as m; "
            "print(m.StateRequest().ByteSize())",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip() == "0"
