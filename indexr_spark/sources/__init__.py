"""Table catalog, segment writer/reader, and stats-sidecar skipping."""
