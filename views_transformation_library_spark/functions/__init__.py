"""Column-level helper functions shared across operators."""
