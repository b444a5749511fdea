"""Make `google.protobuf` importable from the machine's only on-disk
pure-Python protobuf runtime (the Google Cloud SDK's vendored copy,
shipped under the `cloudsdk.google.protobuf` namespace).

Why: pyspark's transformWithStateInPandas talks to the JVM state server
over protobuf (pyspark/sql/streaming/proto/StateMessage_pb2.py), so the
`google.protobuf` runtime must import in BOTH the driver process and the
spawned TWS python workers. This sandbox has no `protobuf` site-package
and installs are off-limits — but the Cloud SDK vendors protobuf 4.23.2
(pure python) under its own namespace. A meta-path finder aliases
`google.protobuf[.sub]` imports onto `cloudsdk.google.protobuf[.sub]`,
so there is exactly ONE copy of every module (no parallel descriptor
pools, which a __path__-overlay would create). The pb2 files generated
by newer protoc also import `google.protobuf.runtime_version` (added in
protobuf 5.27); a stub with a no-op version check stands in — safe here
because the proto3 wire/builder surface the pb2 uses is stable across
4.23 -> 5.x gencode.

Worker propagation: workers are separate interpreters, so the finder
must install at THEIR startup too — `pypath_shim/sitecustomize.py` (put
on PYTHONPATH by ensure_tws_env before the JVM launches) re-invokes
install() in every child python.

This file references only public, on-disk artifacts of the base image.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.machinery
import os
import sys
import types

SDK_ROOT = "/usr/lib/google-cloud-sdk/lib/third_party"


def _runtime_version_module() -> types.ModuleType:
    rv = types.ModuleType("google.protobuf.runtime_version")

    class Domain:
        GOOGLE_INTERNAL = 1
        PUBLIC = 2

    rv.Domain = Domain
    rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    return rv


class _RVLoader(importlib.abc.Loader):
    def create_module(self, spec):
        return _runtime_version_module()

    def exec_module(self, module):
        pass


class _AliasLoader(importlib.abc.Loader):
    def __init__(self, real: str):
        self.real = real

    def create_module(self, spec):
        return importlib.import_module(self.real)

    def exec_module(self, module):
        pass


class _AliasFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        # A from-import re-resolves children under the aliased module's
        # REAL name (cloudsdk...), so the stub must answer both spellings.
        if fullname == "cloudsdk.google.protobuf.runtime_version":
            return importlib.machinery.ModuleSpec(fullname, _RVLoader())
        if fullname == "google" or fullname.startswith("google.protobuf"):
            if fullname.endswith(".runtime_version"):
                return importlib.machinery.ModuleSpec(fullname, _RVLoader())
            real = "cloudsdk." + fullname
            try:
                importlib.import_module(real)
            except ImportError:
                return None
            spec = importlib.machinery.ModuleSpec(fullname, _AliasLoader(real))
            spec.submodule_search_locations = getattr(
                sys.modules[real], "__path__", None
            )
            return spec
        return None


def install() -> bool:
    """Idempotently install the alias finder. True if protobuf usable."""
    if not os.path.isdir(SDK_ROOT):
        return False
    if SDK_ROOT not in sys.path:
        sys.path.insert(0, SDK_ROOT)
    if not any(isinstance(f, _AliasFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _AliasFinder())
    try:
        importlib.import_module("google.protobuf.descriptor")
        return True
    except Exception:
        return False


def ensure_tws_env() -> bool:
    """Make protobuf importable in-process AND in spark's child pythons
    (via the sitecustomize shim on PYTHONPATH). Must run before the JVM
    launches for the env var to reach worker subprocesses; on an
    already-running JVM the TWS caller falls back (streaming/tws.py)."""
    if not install():
        return False
    shim = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pypath_shim")
    cur = os.environ.get("PYTHONPATH", "")
    if shim not in cur.split(os.pathsep):
        os.environ["PYTHONPATH"] = shim + (os.pathsep + cur if cur else "")
    return True
