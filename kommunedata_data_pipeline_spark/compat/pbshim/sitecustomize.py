"""Worker-side protobuf bootstrap (see compat/pbruntime.py).

Python's ``site`` module imports a ``sitecustomize`` from sys.path at
interpreter startup; this directory is placed on the worker PYTHONPATH
only for transformWithState queries, so this runs before the worker
deserializes the stateful processor (which hard-imports
google.protobuf). Deliberately standalone — the engine package may not
be importable in the worker — and defensive: any failure leaves the
interpreter exactly as it was and the worker surfaces pyspark's own
ImportError instead.

The runtime directories arrive via ``KDP_PB_RUNTIME_PATHS`` and are
appended to the END of sys.path (never via PYTHONPATH, which precedes
site-packages): a regular package anywhere on sys.path beats namespace
portions regardless of position, so a real site-packages install still
wins, while the vendored third_party tree can't shadow anything else.

One trap this must handle: Spark worker PYTHONPATHs include JVM jars
(e.g. spark-core.jar) whose embedded ``google/protobuf/*.proto``
resources zipimport as an EMPTY namespace-package portion. A failed
first import then caches that empty ``google.protobuf`` in
sys.modules, and no later path change can rescue the cached module —
so the retry purges ``google*`` from sys.modules first.
"""

import os
import sys


def _forget_google() -> None:
    for name in [
        n for n in list(sys.modules) if n == "google" or n.startswith("google.")
    ]:
        del sys.modules[name]


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
        # drop any namespace-portion google/* cached by the failed probe
        _forget_google()
        sys.path.extend(paths)
        import importlib

        importlib.invalidate_caches()
        try:
            import google.protobuf.internal.builder  # noqa: F401
        except Exception:
            for p in paths:
                sys.path.remove(p)
            _forget_google()
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
