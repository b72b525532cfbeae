from .tables import TableIO  # noqa: F401
