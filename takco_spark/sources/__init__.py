"""Sources, sinks and checkpointed stage IO (SURVEY.md §2.1)."""
