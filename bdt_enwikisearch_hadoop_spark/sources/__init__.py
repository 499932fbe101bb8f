from .io import load, load_events, rebalance, TABLE_NAMES  # noqa: F401
