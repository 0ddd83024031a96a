"""Collision backends (hydroelastic contact patches; DEM bridge interface)."""
