from .readers import load_ecommerce_csv, load_testdata, read_csv_table

__all__ = ["load_ecommerce_csv", "load_testdata", "read_csv_table"]
