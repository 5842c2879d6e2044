from .readers import TABLES, load_table, register_star_schema, read_csv, read_json

__all__ = ["TABLES", "load_table", "register_star_schema", "read_csv", "read_json"]
