"""Device-mesh parallelism: sharding specs and multi-host helpers."""
