from .synthetic import SyntheticVectorsDataSource
from .tables import TABLES, fan_out, load_table, load_all, register_views

__all__ = [
    "TABLES",
    "SyntheticVectorsDataSource",
    "fan_out",
    "load_table",
    "load_all",
    "register_views",
]
