"""Streaming face: the monitor's discovery loop on Structured Streaming."""
