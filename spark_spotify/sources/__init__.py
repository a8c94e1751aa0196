from spark_spotify.sources.tables import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
