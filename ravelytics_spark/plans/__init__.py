"""Logical plans: the domain view stack and the t2 query catalog."""
