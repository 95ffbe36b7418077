"""Device algorithm library (JAX/XLA + Pallas)."""
