"""Source connectors (JSON ingest; parquet scans live in catalog.py)."""
