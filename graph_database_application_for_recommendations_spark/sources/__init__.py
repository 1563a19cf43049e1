from .tables import STAR_TABLES, load_star, register_star_views
from .views import RefTables, load_ref_tables

__all__ = ["STAR_TABLES", "load_star", "register_star_views", "RefTables", "load_ref_tables"]
