"""Custom streaming sources (SURVEY.md §2.1)."""
