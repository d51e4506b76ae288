"""Structured Streaming surface (SURVEY.md §2.9: the reference has no
streaming; this is the additive capability over the `events` table)."""
