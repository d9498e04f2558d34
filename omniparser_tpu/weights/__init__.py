"""Weight converters (reference checkpoints -> JAX pytrees) + orbax save/load."""
