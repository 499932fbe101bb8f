from .io import load, load_events, materialized, rebalance, TABLE_NAMES  # noqa: F401
