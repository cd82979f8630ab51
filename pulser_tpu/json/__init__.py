"""JSON serialization for pulser_tpu."""
