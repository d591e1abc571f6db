from .sources import TABLE_NAMES, Tables, load_table, register_views

__all__ = ["TABLE_NAMES", "Tables", "load_table", "register_views"]
