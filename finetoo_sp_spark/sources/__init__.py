"""Sources & sinks: pages-table IO, lineage manifests, checkpoint resume."""

from finetoo_sp_spark.sources.lineage import (
    read_manifests,
    run_resumable_extraction,
    write_with_manifests,
)

__all__ = ["write_with_manifests", "read_manifests", "run_resumable_extraction"]
