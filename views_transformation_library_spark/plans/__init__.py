"""Plan inspection helpers (explain/verification utilities)."""
