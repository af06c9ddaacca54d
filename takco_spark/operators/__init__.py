"""Relational + ER operators (SURVEY.md §2)."""
