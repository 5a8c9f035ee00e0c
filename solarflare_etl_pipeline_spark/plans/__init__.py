"""Plan inspection and physical-layout strategies (explain audits, bucketing)."""
