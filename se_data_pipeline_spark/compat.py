"""Environment compatibility shims.

ensure_protobuf(): transformWithStateInPandas needs ``google.protobuf``
(the generated ``pyspark/sql/streaming/proto/StateMessage_pb2.py``
imports it — both in the driver AND inside every Python worker that
talks to the JVM state server). When the real protobuf distribution
is absent, fall back to the vendored minimal runtime in
``_vendor/protoshim`` (see its _shim.py for scope), making it visible
to (a) this process via sys.path and (b) the daemon-forked Python
workers via PYTHONPATH — which therefore must be set BEFORE the JVM
launches. The real distribution, when present, always wins.
"""

from __future__ import annotations

import os
import sys

_SHIM_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "_vendor", "protoshim"
)


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable; returns True iff the
    vendored shim (rather than the real package) is serving it."""
    try:
        import google.protobuf  # noqa: F401

        return "protoshim" in (google.protobuf.__file__ or "")
    except ImportError:
        pass
    if _SHIM_DIR not in sys.path:
        sys.path.insert(0, _SHIM_DIR)
    parts = os.environ.get("PYTHONPATH", "")
    if _SHIM_DIR not in parts.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _SHIM_DIR + (os.pathsep + parts if parts else "")
        )
    import google.protobuf  # noqa: F401

    return True
