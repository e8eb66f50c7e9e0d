"""Training entry points and task modules."""
