"""Dataset sources/sinks for the corpus table."""
