"""Pipeline drivers (reference core/ — one per CLI command)."""
