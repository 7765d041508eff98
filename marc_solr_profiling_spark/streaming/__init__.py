"""Structured Streaming surface (batch-incremental, Trigger.AvailableNow)."""
