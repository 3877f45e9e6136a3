"""Command-line entry points: train / test (demo) / evaluate / tools."""
