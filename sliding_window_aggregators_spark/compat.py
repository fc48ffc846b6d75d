"""Environment compatibility shims.

``ensure_protobuf`` makes ``google.protobuf`` importable so pyspark's
``transformWithStateInPandas`` Python↔JVM state protocol
(pyspark/sql/streaming/proto/StateMessage_pb2.py) can run in containers
without the protobuf wheel: a real install always wins; otherwise the
vendored minimal pure-Python runtime in ``_vendor/`` (wire-format subset,
see ``_vendor/google/protobuf/_mini.py``) is put on ``sys.path`` and
exported via ``PYTHONPATH`` so Spark's Python workers — separate
processes spawned by the JVM — inherit it. Call BEFORE creating the
SparkSession; the JVM captures its environment at gateway launch."""

from __future__ import annotations

import os
import sys

_VENDOR_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor")


def ensure_protobuf() -> str:
    """Return 'real' if a protobuf wheel is installed, else make the
    vendored mini-runtime importable (driver + future Spark workers) and
    return 'vendored'. Raises ImportError only if both are unusable."""
    try:
        import google.protobuf  # noqa: F401

        return "vendored" if getattr(
            google.protobuf, "SWAG_MINI_RUNTIME", False
        ) else "real"
    except ImportError:
        pass
    if _VENDOR_DIR not in sys.path:
        sys.path.insert(0, _VENDOR_DIR)
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if _VENDOR_DIR not in parts:
        os.environ["PYTHONPATH"] = (
            _VENDOR_DIR + (os.pathsep + existing if existing else "")
        )
    import google.protobuf  # noqa: F401  (raises if the shim is broken)

    return "vendored"


def protobuf_available() -> bool:
    """True when ``google.protobuf`` can be made importable (always, once
    the vendored runtime exists — kept for skip-gates that want a soft
    probe without mutating sys.path on failure)."""
    try:
        ensure_protobuf()
        return True
    except ImportError:
        return False
