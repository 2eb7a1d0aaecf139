"""CLI entry points: train, inference, validate, calculate_metrics."""
