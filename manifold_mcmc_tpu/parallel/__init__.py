"""Device-mesh utilities for sharding chains across TPU slices."""
