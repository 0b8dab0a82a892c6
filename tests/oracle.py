"""Independent reference fold (FIXTURES.md §4) — pandas, no engine code.

Final expected state: take the max-``seq`` event per ``(conv_id,
turn_idx)``; if its op is ``D`` the row is absent; else the row carries
that event's payload and ``ts``. Mirrors the reference's golden-output
test style (CaptureChangeMySQLTest.java:216-1294).
"""

from __future__ import annotations

import pandas as pd


def pandas_fold(events: pd.DataFrame) -> pd.DataFrame:
    idx = events.groupby(["conv_id", "turn_idx"])["seq"].idxmax()
    latest = events.loc[idx]
    final = latest[latest["op"] != "D"]
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    cols = [c for c in cols if c in final.columns]
    return (
        final[cols]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def assert_final_state_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    """Per-turn text equality under stable (conv_id, turn_idx) ordering."""
    cols = [c for c in ["conv_id", "turn_idx", "role", "text", "tool", "ts"] if c in expected.columns]
    a = actual[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    e = expected[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, e, check_dtype=False)
