from cartography_spark.pipeline.sync import Sync, load, load_matchlink

__all__ = ["Sync", "load", "load_matchlink"]
