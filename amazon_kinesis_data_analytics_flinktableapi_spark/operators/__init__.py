"""Relational + pipeline operators, each designed partition-wise for scale."""
