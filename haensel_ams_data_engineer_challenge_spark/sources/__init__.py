from .jsonl import read_documents_jsonl
from .tables import TESTDATA_TABLES, load_table, load_tables, register_views
from .warc import read_documents_warc

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "read_documents_jsonl",
    "read_documents_warc",
    "register_views",
]
