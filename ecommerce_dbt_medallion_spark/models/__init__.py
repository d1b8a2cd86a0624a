from ecommerce_dbt_medallion_spark.models import bronze, silver, gold

__all__ = ["bronze", "silver", "gold"]
