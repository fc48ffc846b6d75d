"""Backport of CPython's newer ``zipimporter.invalidate_caches``
behavior (bpo-19081 follow-ups, gh-97513: re-read the zip's central
directory only when the archive's mtime/size changed) for the Python
3.11 runtime this sandbox ships.

Why it matters here: pyspark's worker setup calls
``importlib.invalidate_caches()`` once PER TASK, and on 3.11 every live
``zipimporter`` unconditionally re-reads its whole zip directory —
measured 5.5 ms/task for pyspark.zip on this box, a fixed tax on every
Python-touching task of every query (32-task stateful triggers pay it
32× per micro-batch). With the guard, an unchanged zip costs one
``stat``. Modified/replaced zips are still picked up exactly as before
(mtime/size change → full re-read), which is the semantics newer
CPython itself adopted.
"""

from __future__ import annotations

import os
import zipimport

_orig = zipimport.zipimporter.invalidate_caches
_sig: dict = {}


def _guarded(self):  # noqa: ANN001 - stdlib signature
    try:
        st = os.stat(self.archive)
        sig = (st.st_mtime_ns, st.st_size)
    except OSError:
        _sig.pop(self.archive, None)
        return _orig(self)
    if _sig.get(self.archive) == sig:
        return None
    _sig[self.archive] = sig
    return _orig(self)


def apply() -> None:
    if getattr(zipimport.zipimporter, "_swag_mtime_guard", False):
        return
    zipimport.zipimporter.invalidate_caches = _guarded
    zipimport.zipimporter._swag_mtime_guard = True
