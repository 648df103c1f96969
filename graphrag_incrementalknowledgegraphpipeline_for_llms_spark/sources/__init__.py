from .catalog import ParquetCatalog  # noqa: F401
