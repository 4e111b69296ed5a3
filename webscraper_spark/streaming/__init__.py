from .rounds import streaming_host_metrics, streaming_ingest  # noqa: F401
