"""Sources: deterministic synthetic generators (streets, buildings,
pages corpus) and parquet IO helpers."""
