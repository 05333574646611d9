"""DataFrame-space operator builders (SURVEY.md §2.4-§2.7)."""
