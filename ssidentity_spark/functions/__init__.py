"""Reusable Column-expression functions (the engine's scalar library)."""

from ssidentity_spark.functions.fspl import fspl_distance, fspl_rssi  # noqa: F401
