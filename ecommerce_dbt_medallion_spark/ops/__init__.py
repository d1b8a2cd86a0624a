from ecommerce_dbt_medallion_spark.ops import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
