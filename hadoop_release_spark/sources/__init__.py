"""Source/sink round-trips and partitioned writers."""
