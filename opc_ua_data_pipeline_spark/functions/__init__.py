"""Deterministic data generation: the reference simulator's dynamics
re-expressed as a seeded fixture generator (FIXTURES.md)."""
