"""Device-free scheduling core + the JAX execution engine."""
