from .extract_stream import stream_extract  # noqa: F401
from .metrics_stream import stream_metrics, windowed_type_counts  # noqa: F401
from .dedup_stream import streaming_first_seen  # noqa: F401
from .sketch_stream import stream_cms, windowed_cms_cells  # noqa: F401
