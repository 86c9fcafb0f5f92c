from cartography_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views
from cartography_spark.sources.pages import synthesize_pages

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_views", "synthesize_pages"]
