"""Structured Streaming subsystem.

The reference's only "streaming" is a 30-minute cron re-running batch
ingestion with delete-after-read (assets/__init__.py:51-57, assets.py:66)
and archive-to-configuration (assets.py:289-291). Here that becomes a real
Structured Streaming file source with checkpointing and cleanSource
(file_ingest.py), plus net-new event-time window operators over the
``events`` table (event_windows.py).
"""
