from .io import load, load_events, TABLE_NAMES  # noqa: F401
