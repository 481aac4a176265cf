"""Batched and sharded execution: vmap batches, mesh-sharded huge problems."""
