from streamalert_spark.streaming.pipeline import StreamingPipeline
from streamalert_spark.streaming.merge import streaming_merge
from streamalert_spark.streaming.sinks import HistoricalStore, AlertDispatcher

__all__ = ["StreamingPipeline", "streaming_merge", "HistoricalStore", "AlertDispatcher"]
