"""Parity oracle: a pure-Python reimplementation of the reference crawler's
observable semantics (SURVEY.md §5.2), replayed against the engine."""
