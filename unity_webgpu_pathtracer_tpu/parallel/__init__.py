"""Multi-chip scaling: film tiling + sample sharding over a device mesh."""
