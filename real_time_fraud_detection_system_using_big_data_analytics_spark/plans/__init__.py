from .registry import ORACLE, QUERIES, register

__all__ = ["ORACLE", "QUERIES", "register"]
