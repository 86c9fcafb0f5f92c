from cartography_spark.functions.textextract import extract_text
from cartography_spark.functions.triples import extract_triples, extract_mentions

__all__ = ["extract_text", "extract_triples", "extract_mentions"]
