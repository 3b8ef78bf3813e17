"""Sources: input-table builders and readers for the extraction engine."""
