"""Ray Data pipeline wiring."""
