"""Sources and sinks (SURVEY.md §2.1 S1-S10)."""
