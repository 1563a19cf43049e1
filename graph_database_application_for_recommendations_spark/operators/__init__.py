"""Relational operators & serving queries (SURVEY.md §2 inventory)."""
