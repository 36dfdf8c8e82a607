"""Worker-side protobuf bootstrap (see compat/pbruntime.py).

Python's ``site`` module imports a ``sitecustomize`` from sys.path at
interpreter startup; this directory is placed on the worker PYTHONPATH
only for transformWithState queries, so this runs before the worker
deserializes the stateful processor (which hard-imports
google.protobuf). Deliberately standalone — the engine package may not
be importable in the worker — and defensive: any failure leaves the
interpreter exactly as it was and the worker surfaces pyspark's own
ImportError instead.
"""

import os
import sys


def _bootstrap() -> None:
    try:
        import google.protobuf.internal.builder  # noqa: F401  (real install wins)
    except Exception:
        paths = [
            p
            for p in os.environ.get("KDP_PB_RUNTIME_PATHS", "").split(os.pathsep)
            if p and os.path.isdir(p) and p not in sys.path
        ]
        if not paths:
            return
        sys.path.extend(paths)
        try:
            import google.protobuf.internal.builder  # noqa: F401
        except Exception:
            for p in paths:
                sys.path.remove(p)
            return
    # gencode from protoc>=27 imports this module; absent on 4.x runtimes
    if "google.protobuf.runtime_version" not in sys.modules:
        try:
            import google.protobuf.runtime_version  # noqa: F401
        except ImportError:
            import types

            mod = types.ModuleType("google.protobuf.runtime_version")

            class _Domain:
                PUBLIC = 0
                GOOGLE_INTERNAL = 1

            mod.Domain = _Domain
            mod.ValidateProtobufRuntimeVersion = lambda *a, **k: None
            sys.modules["google.protobuf.runtime_version"] = mod


try:
    _bootstrap()
except Exception:
    pass
