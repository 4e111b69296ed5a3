from .politeness import streaming_politeness  # noqa: F401
from .rounds import streaming_host_metrics, streaming_ingest  # noqa: F401
