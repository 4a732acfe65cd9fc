"""Pipeline-extension matrix entries (registered into matrix)."""
