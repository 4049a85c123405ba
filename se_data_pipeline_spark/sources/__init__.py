"""Sources & sinks: typed file scans (files.py), pluggable acquire
connectors with dead-letter routing (acquire.py), checkpointed
publish sink with retry + batch-id idempotence (publish.py)."""
