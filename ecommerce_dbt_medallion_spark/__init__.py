"""PySpark-native analytics engine with the query/data-processing
capabilities of the ecommerce-dbt-medallion reference (dbt + Snowflake),
re-expressed Spark-first: bronze/silver/gold medallion models as pure
DataFrame builders, a dbt-style data-quality engine, event analytics,
structured streaming rollups, and LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Reference parity map lives in SURVEY.md §2; each model's docstring cites
the reference file it re-implements.
"""

__version__ = "0.1.0"
