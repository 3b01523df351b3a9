from kwack_spark.operators import asof, dedup, similarity

__all__ = ["asof", "dedup", "similarity"]
