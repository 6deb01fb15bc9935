"""Device-mesh construction and sharded train/eval program builders."""
