"""Sources: synthetic closed-world generator and frontier seed loading."""
