from .scalars import dsum, safe_div, ts_concat

__all__ = ["dsum", "safe_div", "ts_concat"]
