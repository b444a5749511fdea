"""Placeholder — queries added incrementally (SURVEY.md §2B)."""
