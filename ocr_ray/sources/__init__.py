"""Dataset sources with column pruning."""
