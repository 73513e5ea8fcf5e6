from .scalars import q, q_sql

__all__ = ["q", "q_sql"]
