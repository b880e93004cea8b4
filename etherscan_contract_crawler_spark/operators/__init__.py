"""Operators: dedup (bloom/cuckoo + anti-join), politeness scheduling, fetch,
validate, retry — the engine's dataflow stages (SURVEY.md §2)."""
