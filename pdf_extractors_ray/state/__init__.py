from .lineage import partitioned_extract, read_output, read_lineage  # noqa: F401
