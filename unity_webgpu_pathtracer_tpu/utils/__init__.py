"""Utility layer: vector math, RNG, imaging, profiling, logging."""
