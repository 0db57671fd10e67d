"""Batch ingestion: schema-declared readers and set-oriented sinks
(SURVEY.md §2.1). Streaming sources live in ``streaming/``.
"""
