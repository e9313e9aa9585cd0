"""etl_rs_spark — a PySpark-native CDC / incremental-ingest analytics engine.

Brand-new Spark-first engine with the query and data-processing
capabilities of the reference library silvanoneto/etl-rs (a Rust
Pipeline::builder().extract().transform().load() framework, see
/root/reference/src/lib.rs:49-58), re-expressed on the Spark DataFrame /
Structured Streaming stack:

- ``session``    — SparkSession factory (AQE, Arrow, tunable parallelism)
- ``config``     — EngineConfig (parity with reference ETLConfig,
                   /root/reference/src/config.rs:6-115)
- ``errors``     — error taxonomy (reference src/error.rs:8-32)
- ``generator``  — deterministic synthetic transcripts + CDC change stream
- ``oracle``     — pure-pandas LWW replay oracle (test ground truth)
- ``functions``  — flexible coercions (reference src/types.rs:206-331),
                   text analysis, vector similarity
- ``sources``    — CSV / JSON / JSONL / Parquet / lake readers
                   (reference src/extract/*)
- ``sinks``      — JSON / JSONL / console / memory / parquet loaders +
                   the LakeTable merge-on-write table format
                   (reference src/load/*)
- ``operators``  — transforms, aggregate, dedup (exact/LWW/MinHash-LSH/
                   SimHash/n-gram), ANN similarity search, multimodal
- ``cdc``        — the engine core: normalize -> dedup -> MERGE apply,
                   streaming driver with exactly-once checkpoints, lineage
- ``pipeline``   — Pipeline builder API (reference src/pipeline/mod.rs)
"""

__version__ = "0.1.0"

from etl_rs_spark.config import EngineConfig
from etl_rs_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark", "__version__"]
