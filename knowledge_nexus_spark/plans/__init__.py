"""Composed query plans: the driver-contract query suite and helpers."""
