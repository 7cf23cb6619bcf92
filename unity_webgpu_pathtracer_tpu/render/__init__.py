"""Render layer: camera, sampling, BSDF, sky, lights, integrators, film."""
