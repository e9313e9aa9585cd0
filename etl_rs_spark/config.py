"""Engine configuration.

API parity with the reference's ETLConfig
(/root/reference/src/config.rs:6-115): pipeline knobs (batch_size,
parallel_workers, timeout, retries), env-var overrides with the same
ETL_* names (/root/reference/src/config.rs:124-174), and validation that
rejects zero batch/workers/memory (/root/reference/src/config.rs:195-220).
Spark-native knobs (shuffle partitions, merge bucket count, salt) are
added for the CDC engine.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace

from etl_rs_spark.errors import ConfigError

_ENV_PREFIX = "ETL_"


@dataclass(frozen=True)
class PipelineConfig:
    batch_size: int = 1000
    parallel_workers: int = field(default_factory=lambda: os.cpu_count() or 4)
    timeout_seconds: int = 300
    retry_attempts: int = 3
    retry_delay_ms: int = 1000
    retry_backoff_multiplier: float = 2.0  # RetryConfig.backoff_multiplier
    # (/root/reference/src/traits.rs:186-201)


@dataclass(frozen=True)
class PerformanceConfig:
    memory_limit_mb: int = 1024
    io_buffer_size_kb: int = 64
    chunk_size: int = 1000


@dataclass(frozen=True)
class CdcConfig:
    """Spark-native CDC knobs (no reference analogue; the reference's
    DeltaLoader merge is a stub, /root/reference/src/load/delta.rs:255-267)."""

    merge_keys: tuple[str, ...] = ("conv_id", "turn_idx")
    order_cols: tuple[str, ...] = ("ts", "lsn")
    num_buckets: int = 16
    salt_buckets: int = 0  # 0 = single-stage LWW; >0 = two-stage salted
    schema_evolution: bool = True
    #: "wide" (default) = single max(struct(all cols)) aggregation — one
    #: shuffle, fastest measured on transcript-sized payloads; "narrow" =
    #: slim winner-id agg + join-back, for very wide payloads (blobs)
    #: where shuffling the payload dominates
    dedup_strategy: str = "wide"
    #: when set, envelope rows that cannot be merged (null key/order
    #: fields, unparseable payload JSON) are quarantined to this
    #: directory instead of poisoning the LWW dedup; None = legacy
    #: flow-through. Detection rides the dedup scan via df.observe, so
    #: the happy path stays one pass (the quarantine write job only
    #: runs when bad rows actually exist).
    dead_letter_dir: str | None = None


@dataclass(frozen=True)
class EngineConfig:
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    performance: PerformanceConfig = field(default_factory=PerformanceConfig)
    cdc: CdcConfig = field(default_factory=CdcConfig)

    def validate(self) -> "EngineConfig":
        """Reject zero-valued knobs, mirroring the reference's
        ConfigValidation (/root/reference/src/config.rs:195-220)."""
        if self.pipeline.batch_size <= 0:
            raise ConfigError("batch_size must be > 0")
        if self.pipeline.parallel_workers <= 0:
            raise ConfigError("parallel_workers must be > 0")
        if self.performance.memory_limit_mb <= 0:
            raise ConfigError("memory_limit_mb must be > 0")
        if self.cdc.num_buckets <= 0:
            raise ConfigError("num_buckets must be > 0")
        return self

    @classmethod
    def from_env(cls) -> "EngineConfig":
        """ETL_BATCH_SIZE / ETL_PARALLEL_WORKERS / ETL_TIMEOUT_SECONDS /
        ETL_RETRY_ATTEMPTS env overrides, same names as the reference
        (/root/reference/src/config.rs:124-174)."""
        cfg = cls()
        pipe = cfg.pipeline
        mapping = {
            "BATCH_SIZE": "batch_size",
            "PARALLEL_WORKERS": "parallel_workers",
            "TIMEOUT_SECONDS": "timeout_seconds",
            "RETRY_ATTEMPTS": "retry_attempts",
            "RETRY_DELAY_MS": "retry_delay_ms",
        }
        updates: dict[str, int] = {}
        for env_key, attr in mapping.items():
            raw = os.environ.get(_ENV_PREFIX + env_key)
            if raw is not None:
                try:
                    updates[attr] = int(raw)
                except ValueError as exc:
                    raise ConfigError(
                        f"invalid {_ENV_PREFIX + env_key}={raw!r}: not an int"
                    ) from exc
        if updates:
            pipe = replace(pipe, **updates)
        return replace(cfg, pipeline=pipe).validate()

    @classmethod
    def from_toml(cls, toml_str: str) -> "EngineConfig":
        """Config from a TOML string — reference ETLConfig::from_toml
        (/root/reference/src/config.rs:186-192). Section/field names
        mirror the reference's [pipeline] / [performance] tables, plus
        the Spark-native [cdc] section; unknown keys are ignored (the
        reference's serde deserializer is equally permissive about
        extra sections like [features])."""
        import tomllib

        try:
            doc = tomllib.loads(toml_str)
        except tomllib.TOMLDecodeError as exc:
            raise ConfigError(f"invalid TOML: {exc}") from exc
        cfg = cls()

        def _section(obj, data):
            known = {f for f in obj.__dataclass_fields__}
            updates = {}
            for k, v in (data or {}).items():
                if k in known:
                    tgt = type(getattr(obj, k))
                    try:
                        updates[k] = (
                            tuple(v) if tgt is tuple else tgt(v)
                        )
                    except (TypeError, ValueError) as exc:
                        raise ConfigError(
                            f"invalid value for {k}: {v!r}"
                        ) from exc
            return replace(obj, **updates) if updates else obj

        return replace(
            cfg,
            pipeline=_section(cfg.pipeline, doc.get("pipeline")),
            performance=_section(cfg.performance, doc.get("performance")),
            cdc=_section(cfg.cdc, doc.get("cdc")),
        ).validate()

    @classmethod
    def from_file(cls, path: str) -> "EngineConfig":
        """Config from a TOML file — reference ETLConfig::from_file
        (/root/reference/src/config.rs:177-184)."""
        try:
            with open(path) as f:
                return cls.from_toml(f.read())
        except OSError as exc:
            raise ConfigError(f"cannot read config file {path}: {exc}") from exc
