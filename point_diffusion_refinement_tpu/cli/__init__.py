"""Command-line drivers (train / generate / eval bookkeeping)."""
