"""Device-mesh parallelism: query sharding and multi-device build."""
