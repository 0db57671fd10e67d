"""Structured Streaming pipelines — the reference's main loop re-expressed
as readStream → transform → foreachBatch merges with checkpointed
exactly-once file progress (flows/steam_price_pipeline.py:25-91).
"""
