"""miekki-spark: PySpark-native near-duplicate detection & clustering.

From-scratch re-expression of the Malfoy/Miekki capability set
(BASELINE.json north_star) in idiomatic Spark 4.x: DataFrame/SQL for
everything codegen-able, Arrow-vectorized pandas UDFs for the numeric
kernels, large-star/small-star connected components as DataFrame
self-joins. Blueprint: SURVEY.md.
"""

__version__ = "0.1.0"
