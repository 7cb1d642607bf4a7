"""Reusable column-level / DataFrame-level function library."""
