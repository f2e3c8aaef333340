"""Scalar/fingerprint functions (numpy cores used inside vectorized UDFs)."""
