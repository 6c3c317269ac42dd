"""§2 plans module — populated in a later milestone (SURVEY.md §7)."""
