"""Subpackage of embulk_util_json_spark."""
