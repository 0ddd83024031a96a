"""SPMD scaling: mesh partitioning and sharded solver steps."""
