"""Relational + feature operators (SURVEY.md §2)."""
