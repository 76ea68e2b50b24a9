from .readers import read_csv_golden, read_jdbc, read_json, read_parquet

__all__ = ["read_parquet", "read_csv_golden", "read_json", "read_jdbc"]
