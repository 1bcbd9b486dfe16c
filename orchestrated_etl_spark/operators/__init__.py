"""Relational operators covering SURVEY.md §2's inventory plus the gap list."""
