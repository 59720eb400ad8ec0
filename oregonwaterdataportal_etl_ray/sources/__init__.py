from .readers import read_table, small_table  # noqa: F401
