"""crawler_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch re-expression of the dataflow semantics of the reference
crawler (``e8kor/crawler``, read-only at /root/reference) as idiomatic
Spark DataFrame programs:

- frontier expansion      (reference: otodom/total_pages/handler.go)
- politeness-bounded fan-out (reference: stack.yml replica caps +
  otodom/orchestrator/handler.go:91 channel cap)
- fetch + extract          (reference: otodom/{flat,office}_crawler/handler.go)
- dedup-on-write URL-seen  (reference: commons/Entry.go:37 ON CONFLICT)
- partitioned storage      (reference: storage/handler.go:103 Hive paths)
- resumable round scheduling (reference: stack.yml cron triggers)

Everything is a DataFrame; compute is Spark SQL expressions or
vectorized pandas/Arrow UDFs (no per-row Python UDFs); state lives in
snapshot-committed parquet tables (Iceberg-style manifest protocol,
see ``crawler_spark.sinks``).
"""

__version__ = "0.1.0"
