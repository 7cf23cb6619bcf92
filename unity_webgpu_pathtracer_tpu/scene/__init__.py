"""Scene layer: meshes, materials, textures, lights, environment, loaders."""
