"""Command-line entry points (reference repo-root scripts, SURVEY.md §2.8)."""
