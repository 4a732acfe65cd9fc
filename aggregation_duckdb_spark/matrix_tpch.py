"""TPC-H-ish operator matrix entries (registered into matrix)."""
