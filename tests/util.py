"""Test comparison helpers."""

from __future__ import annotations

import pandas as pd
import pandas.testing as pdt

KEY = ["conv_id", "turn_idx"]


def normalize_frame(df: pd.DataFrame, sort_keys=KEY) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    out = out.sort_values(sort_keys, kind="mergesort").reset_index(drop=True)
    # unify timestamp precision / tz-naive for comparison
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif out[c].dtype == object or str(out[c].dtype) in ("string", "boolean"):
            out[c] = out[c].where(pd.notna(out[c]), None)
    return out


def assert_state_equal(engine: pd.DataFrame, oracle: pd.DataFrame, cols=None):
    """Final-state equality sorted by (conv_id, turn_idx) — the
    BASELINE.json per-row invariant (per-turn text equality under stable
    turn ordering)."""
    if cols is None:
        cols = sorted(set(engine.columns) & set(oracle.columns))
    e = normalize_frame(engine[list(cols)])
    o = normalize_frame(oracle[list(cols)])
    assert len(e) == len(o), f"row count {len(e)} != oracle {len(o)}"
    pdt.assert_frame_equal(e, o, check_dtype=False, check_like=True)
