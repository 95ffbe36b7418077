"""Config, metrics, logging, checkpointing, output generation."""
