from etl_rs_spark.operators.dedup import lww_dedup

__all__ = ["lww_dedup"]
