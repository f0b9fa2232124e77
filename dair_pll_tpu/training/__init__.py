"""Training: experiment configs, supervised learning loop, losses."""
