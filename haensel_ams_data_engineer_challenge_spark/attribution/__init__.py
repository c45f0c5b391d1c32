from .model import (
    ORACLE_PRELUDE,
    conversions,
    costs,
    sessions,
    sessions_with_cost,
)

__all__ = [
    "ORACLE_PRELUDE",
    "conversions",
    "costs",
    "sessions",
    "sessions_with_cost",
]
