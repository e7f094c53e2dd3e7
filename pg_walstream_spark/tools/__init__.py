"""Operational tools bridging a live PostgreSQL replication slot to the
replay engine's frame-file transport (see docs/LIVE_TAIL.md)."""
