"""Observability + persistence utilities: metric history, step timing,
checkpointing, autocorrelation/ESS analysis."""
