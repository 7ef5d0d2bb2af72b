"""Sources & sinks: Kafka (JSON/Avro), files (parquet/csv/json),
rate source for tests."""
