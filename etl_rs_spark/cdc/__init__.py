from etl_rs_spark.cdc.apply import apply_batch
from etl_rs_spark.cdc.normalize import normalize_events
from etl_rs_spark.cdc.stream import StreamDriver

__all__ = ["apply_batch", "normalize_events", "StreamDriver"]
