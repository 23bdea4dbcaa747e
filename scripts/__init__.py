"""CLI scripts (reference train/eval surface) + on-chip check utilities."""
