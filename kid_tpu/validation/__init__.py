"""Reference-equivalence validation: the NumPy golden oracle."""
