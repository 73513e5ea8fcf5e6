from .tables import TABLE_NAMES, load_tables

__all__ = ["TABLE_NAMES", "load_tables"]
