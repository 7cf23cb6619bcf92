"""Post-processing: tonemap operators and the presentation chain."""
