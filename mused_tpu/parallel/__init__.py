"""Multi-chip execution: meshes, sketch-merge collectives, sharded steps."""
