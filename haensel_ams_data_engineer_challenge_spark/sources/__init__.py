from .jsonl import read_documents_jsonl
from .tables import TESTDATA_TABLES, load_table, load_tables, register_views

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "read_documents_jsonl",
    "register_views",
]
