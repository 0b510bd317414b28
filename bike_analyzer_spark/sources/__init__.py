from .catalog import load, register_views  # noqa: F401
