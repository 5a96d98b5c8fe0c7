"""Sources & ingest: NDJSON sequence ingest, lineage/phylo builders, versioned
Parquet dataset lifecycle.

Reference: ``/root/reference/src/silo/append/`` (NDJSON streaming insert),
``documentation/input_format.md`` (payload shapes),
``documentation/incremental_preprocessing.md`` (versioned snapshots).
"""

from lapis_silo_spark.sources.ndjson import TableConfig, ingest_records, ingest_ndjson
from lapis_silo_spark.sources.lineage import build_lineage_closure
from lapis_silo_spark.sources.phylo import parse_newick, build_phylo_nodes

__all__ = [
    "TableConfig",
    "ingest_records",
    "ingest_ndjson",
    "build_lineage_closure",
    "parse_newick",
    "build_phylo_nodes",
]
