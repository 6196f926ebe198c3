"""raster_join_spark — a from-scratch, PySpark-native spatial-join + tiling engine.

Re-expresses the query capabilities of VIDA-NYU/raster-join (GPU raster-vector
spatial aggregation, VLDB'18) as idiomatic Spark DataFrame plans:

- point ingest (geo filter + Web-Mercator projection)  -> native column exprs
- spatio-temporal hash-grid partitioning               -> partitioned parquet layout
- partition-pruned coarse scan                         -> Catalyst partition pruning
- attribute constraint filters                         -> Catalyst predicates
- 4 spatial-join strategies (raster / index / hybrid / error-bounds)
                                                       -> cell pre-agg + broadcast
                                                          cell->polygon cover join +
                                                          exact PIP pandas UDF refine
- group-by-polygon COUNT/SUM/AVG                       -> hash aggregate
- kNN via cell-ring expansion                          -> iterative broadcast join

plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB corpus engine needs.

All heavy per-row logic is vectorized: JVM-side pyspark.sql.functions where
expressible, Arrow-batched pandas UDFs otherwise. No per-row Python anywhere.
"""

__version__ = "0.1.0"
