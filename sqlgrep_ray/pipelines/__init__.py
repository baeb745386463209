"""Logical plans (Select/Aggregate dataclasses) and the Plan × Dataset runner."""
