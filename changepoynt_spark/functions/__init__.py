"""Native helper functions (series construction, array math)."""
