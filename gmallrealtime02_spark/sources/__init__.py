from .formats import read_csv, read_jsonl, read_orc
from .tables import load_table, load_tables, register_views

__all__ = [
    "load_table",
    "load_tables",
    "read_csv",
    "read_jsonl",
    "read_orc",
    "register_views",
]
