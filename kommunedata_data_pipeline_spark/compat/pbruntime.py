"""Best-effort google.protobuf bootstrap.

Spark 4's ``transformWithStateInPandas`` talks to the JVM state server
over protobuf; its Python runner hard-imports ``google.protobuf``. This
container has no protobuf pip package, but hosts commonly carry a
pure-Python protobuf runtime vendored by other tooling (the Google
Cloud SDK ships one under ``lib/third_party``). For the handful of
small control messages per micro-batch the pure-Python runtime is
ample, so we probe those locations and, when one provides the modern
descriptor ``_builder`` API, append it to ``sys.path``.

One wrinkle: PySpark's generated ``StateMessage_pb2`` was emitted by a
protoc >= 27, whose gencode preamble imports
``google.protobuf.runtime_version`` and validates runtime >= 5.27.
That module simply doesn't exist in 4.x runtimes. The serialized
descriptor wire format it guards is unchanged for this proto (proto3,
no editions features) — verified by a round-trip test — so when we fall
back to a 4.x runtime we install a no-op ``runtime_version`` shim.

Two processes need the bootstrap:

- the **driver** — ``ensure_protobuf()`` below, called from
  ``streaming.stateful.tws_available``;
- every **Python worker** — workers import the pb2 module while
  deserializing the stateful processor, before any user code runs, so
  the bootstrap must happen at interpreter startup. ``sitecustomize``
  is the standard hook: Python's ``site`` module imports a module named
  ``sitecustomize`` from ``sys.path`` at startup. We ship one in
  ``compat/pbshim/`` and arrange for that directory to be on the
  worker's ``PYTHONPATH`` via ``SparkContext.environment`` (PySpark
  passes that dict as the env of every newly created PythonFunction;
  the JVM worker factory merges its PYTHONPATH into the spawned
  worker's and sets the rest as process env — see
  ``pyspark/core/rdd.py:_prepare_for_python_RDD``). The exact runtime
  directories the driver discovered are handed to the shim through
  ``KDP_PB_RUNTIME_PATHS`` so the worker does no probing of its own.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

#: Roots that may carry a pure-Python google.protobuf runtime. For each
#: root R, the ``google`` package may live at R/google (appengine, bq
#: layouts) or R/cloudsdk/google (cloud-sdk layout, whose modules also
#: absolute-import ``cloudsdk.google.protobuf`` — requiring R itself on
#: the path as well).
_CANDIDATE_ROOTS = (
    "/usr/lib/google-cloud-sdk/lib/third_party",
    "/usr/lib/google-cloud-sdk/platform/bq/third_party",
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pbshim")

# Resolved by the first ensure_protobuf() call: the sys.path entries the
# fallback runtime needs ([] when a real install satisfies the import).
_runtime_paths: list[str] | None = None


def install_runtime_version_shim() -> None:
    """Install a no-op ``google.protobuf.runtime_version`` if the active
    runtime predates it (see module docstring for why this is sound)."""
    if "google.protobuf.runtime_version" in sys.modules:
        return
    try:
        importlib.import_module("google.protobuf.runtime_version")
        return
    except ImportError:
        pass
    mod = types.ModuleType("google.protobuf.runtime_version")

    class Domain:
        PUBLIC = 0
        GOOGLE_INTERNAL = 1

    mod.Domain = Domain  # type: ignore[attr-defined]
    mod.ValidateProtobufRuntimeVersion = (  # type: ignore[attr-defined]
        lambda *a, **k: None
    )
    sys.modules["google.protobuf.runtime_version"] = mod


def _usable() -> bool:
    """True when google.protobuf imports AND has the descriptor-builder
    API that protoc-generated _pb2 modules require."""
    try:
        importlib.import_module("google.protobuf.internal.builder")
        return True
    except Exception:
        return False


def _forget_google() -> None:
    for name in [n for n in sys.modules if n == "google" or n.startswith("google.")]:
        del sys.modules[name]


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable in THIS process; True on success.

    Prefers a real installation; otherwise appends (never prepends — a
    later real install must win) discovered vendored-runtime paths.
    Idempotent; caches the discovered paths for worker_env_for_protobuf.
    """
    global _runtime_paths
    if _usable():
        install_runtime_version_shim()
        if _runtime_paths is None:
            _runtime_paths = []
        return True
    for root in _CANDIDATE_ROOTS:
        for google_parent in (os.path.join(root, "cloudsdk"), root):
            marker = os.path.join(google_parent, "google", "protobuf", "__init__.py")
            if not os.path.isfile(marker):
                continue
            paths = [p for p in (root, google_parent) if p not in sys.path]
            sys.path.extend(dict.fromkeys(paths))
            importlib.invalidate_caches()
            # a prior failed probe may have cached google/google.protobuf
            # as an EMPTY namespace package (e.g. zipimported from a JVM
            # jar's embedded google/protobuf/*.proto resources); a cached
            # namespace module never re-resolves, so purge before retry
            _forget_google()
            if _usable():
                install_runtime_version_shim()
                _runtime_paths = list(dict.fromkeys((root, google_parent)))
                return True
            # roll back a dud candidate so it can't half-shadow the next
            for p in paths:
                sys.path.remove(p)
            _forget_google()
    return False


def worker_env_for_protobuf(existing_pythonpath: str = "") -> dict[str, str] | None:
    """Env-var additions that give Spark Python workers the same runtime.

    Returns {PYTHONPATH, KDP_PB_RUNTIME_PATHS} to merge into
    ``SparkContext.environment`` before defining a transformWithState
    query, or None when ensure_protobuf() hasn't succeeded. When the
    driver found a real installation (_runtime_paths == []) workers are
    assumed to share the interpreter's site-packages (true in local and
    in any same-image cluster) and only the sitecustomize shim dir is
    added, which then no-ops.

    Only ``_SHIM_DIR`` ships via PYTHONPATH: PYTHONPATH entries precede
    site-packages, so putting the discovered runtime ROOTS there would
    make every worker resolve the whole vendored third_party tree
    (boto3, dateutil, certifi, ...) ahead of real installs — violating
    the append-never-prepend invariant. The roots travel only in
    ``KDP_PB_RUNTIME_PATHS``; the shim's sitecustomize tries the real
    import first and appends them to the END of sys.path, so
    site-packages wins in workers exactly as it does on the driver.
    """
    if _runtime_paths is None and not ensure_protobuf():
        return None
    parts = [_SHIM_DIR]
    if existing_pythonpath:
        parts.append(existing_pythonpath)
    return {
        "PYTHONPATH": os.pathsep.join(dict.fromkeys(parts)),
        "KDP_PB_RUNTIME_PATHS": os.pathsep.join(_runtime_paths or []),
    }
