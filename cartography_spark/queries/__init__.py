from cartography_spark.queries.catalog import QUERIES
from cartography_spark.queries.oracles import ORACLES

__all__ = ["QUERIES", "ORACLES"]
