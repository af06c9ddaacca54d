"""End-to-end pipelines and evaluation jobs (SURVEY.md §3, §7)."""
