"""Data products and utilities (reference utils/, L5)."""
