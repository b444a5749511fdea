"""Auto-imported at child-python startup (this dir rides PYTHONPATH):
installs the google.protobuf alias finder in spark worker processes so
transformWithStateInPandas workers can import their protobuf-backed
state client. See ../protobuf_alias.py for the full rationale."""

import os
import sys

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "..")
)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
try:
    from vault_8_hive_spark.compat.protobuf_alias import install

    install()
except Exception:  # never break an interpreter over an optional shim
    pass
