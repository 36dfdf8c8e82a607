"""Capability-compat layer: make optional runtimes available when the
container lacks the pip package but a pure-Python copy is discoverable
on the host (e.g. google.protobuf vendored by common cloud tooling)."""

from kommunedata_data_pipeline_spark.compat.pbruntime import (  # noqa: F401
    ensure_protobuf,
    worker_env_for_protobuf,
)
