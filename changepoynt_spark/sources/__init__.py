"""Sources: deterministic tokens-table synthesis and table I/O."""
