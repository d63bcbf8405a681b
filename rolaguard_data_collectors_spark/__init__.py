"""PySpark-native analytics engine with the query/data-processing
capabilities of RoLaGuard Community Edition data-collectors
(reference: Argeniss-Software/rolaguard_data-collectors, surveyed in
/root/repo/SURVEY.md).

The reference is a streaming LoRaWAN ETL service; this engine
re-expresses its entire operator surface (SURVEY.md §2) as idiomatic
Spark — DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the stream semantics, Arrow-vectorized pandas UDFs for
the LoRaWAN binary codec — plus the large-scale relational and
LLM-data-pipeline operators the driver contract requires.

Layout:
    session     SparkSession factory tuned for local[N] and cluster.
    catalog     testdata parquet tables -> named temp views.
    schemas     canonical packet schema + raw-source schemas (F1-F6).
    operators/  scalar transforms, packet pipelines, relational and
                stateful batch-shadow query library.
    functions/  LoRaWAN frame codec + crypto as pandas UDFs.
    sources/    PySpark Python DataSource streaming readers
                (MQTT / TTN-v2 WebSocket / TTN-v3 SSE shapes).
    sinks/      envelope serialization + foreachBatch sinks.
    streaming/  stateful streaming ops (device map, prev-packet
                correlation, location propagation, verify gate).
    llm/        dedup, similarity search, text analysis, multimodal.
"""

__version__ = "0.1.0"
