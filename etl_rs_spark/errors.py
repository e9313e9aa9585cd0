"""Error taxonomy.

Parity with the reference's ETLError enum and its recoverability
classification (/root/reference/src/error.rs:8-32,110-121): Extract /
Transform / Load / Config / Pipeline / Io / Serialization / Generic,
where Io and Extract-type failures are retryable and Config /
Serialization are not.
"""

from __future__ import annotations


class ETLError(Exception):
    """Base engine error."""

    recoverable: bool = False


class ExtractError(ETLError):
    recoverable = True


class TransformError(ETLError):
    recoverable = False


class LoadError(ETLError):
    recoverable = True


class ConfigError(ETLError):
    recoverable = False


class PipelineError(ETLError):
    recoverable = False


class IoError(ETLError):
    recoverable = True


class SerializationError(ETLError):
    recoverable = False


def is_recoverable(exc: BaseException) -> bool:
    """Mirrors ETLError::is_recoverable
    (/root/reference/src/error.rs:110-121)."""
    return isinstance(exc, ETLError) and exc.recoverable
