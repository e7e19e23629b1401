"""Sources/sinks: fixture generation, transcript loading, checkpoints."""
