"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Seeded, no wall-clock, vectorized numpy — the engine's test/bench input
since BASELINE.json mandates a transcripts-shaped table and no external
data exists in the sandbox. Zipf tool popularity forces the skew path
(a few hub tools dominate, like the reference corpus' hub entities).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from louvain_spark.schema import TRANSCRIPTS

_WORDS = np.array(
    [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
        "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
        "victor", "whiskey", "xray", "yankee", "zulu",
    ]
)

_BASE_TS = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)


def _join_arrow(*parts) -> np.ndarray:
    """Element-wise concat of str scalars / numpy string arrays via ONE
    pyarrow C++ kernel call, returned as an object ndarray of str.

    Replaces np.char.add chains, which re-allocate the full column per
    operand (the old text build did 11 such passes). Byte-identical
    output for ASCII and any UTF-8 content — pure concatenation.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = [p if isinstance(p, str) else pa.array(p) for p in parts]
    out = pc.binary_join_element_wise(*cols, "")
    return out.to_numpy(zero_copy_only=False)


def _prefixed_zfill(prefix: str, ints: np.ndarray, width: int) -> np.ndarray:
    """prefix + zero-padded decimal of non-negative ints (object ndarray) —
    the arrow form of np.char.add(prefix, np.char.zfill(ints.astype(str), w)).

    Includes np.char.zfill's U<width> dtype semantics: an int whose
    decimal rendering EXCEEDS `width` digits is truncated to its first
    `width` characters (the historical generator stored zfill output in a
    U<width> array). Only the scale4 preset's last chunk reaches 7-digit
    conv indices; preserved bit-for-bit so every preset's bytes — and the
    committed scaling baselines — are unchanged by the arrow rewrite."""
    import pyarrow as pa
    import pyarrow.compute as pc

    s = pc.utf8_slice_codeunits(
        pc.utf8_lpad(pc.cast(pa.array(ints), pa.string()), width, "0"), 0, width
    )
    return pc.binary_join_element_wise(prefix, s, "").to_numpy(zero_copy_only=False)

PRESETS = {
    "tiny": dict(n_conv=20, seed=42),
    "small": dict(n_conv=2000, seed=42),
    "bench": dict(n_conv=50000, seed=42),
    # scaling-evidence presets: big enough that per-task compute dominates
    # fixed scheduling overhead, so core-count scaling is measurable.
    # scale4 exists because at "scale" the per-run serial floor (~15s of
    # job scheduling / sampling / plan time) is ~30% of the 2-core wall —
    # which measures overhead amortization, not the engine's partitioning.
    "scale": dict(n_conv=400000, seed=42),
    "scale4": dict(n_conv=1600000, seed=42),
    # advisory 10x leg: ~6M turns (10x the "bench" preset sf0.1 runs use)
    # for superlinearity checks — times/turn vs bench, not a gate
    "sf1": dict(n_conv=500000, seed=42),
}

# driver-side pandas chunk bound: big presets generate per-chunk and union
# (keeps peak driver memory flat; each chunk is seeded independently)
_CHUNK_CONVS = 400000


def transcripts_pandas(
    n_conv: int = 200,
    seed: int = 42,
    mean_len: int = 12,
    max_len: int = 64,
    n_tools: int = 200,
    tool_prob: float = 0.35,
    zipf_s: float = 1.2,
    conv_offset: int = 0,
) -> pd.DataFrame:
    """Generate the transcripts table as pandas (deterministic in seed).

    conv_offset shifts conversation indices (chunked generation of big
    presets: each chunk gets disjoint conv ids and its own seed).
    """
    rng = np.random.RandomState(seed)
    lengths = np.clip(rng.geometric(1.0 / mean_len, size=n_conv), 2, max_len)
    total = int(lengths.sum())

    conv_idx = np.repeat(np.arange(n_conv) + conv_offset, lengths)
    # one padded string per CONVERSATION, repeated per turn (≈12× fewer
    # string builds than padding per turn; identical values)
    conv_id = np.repeat(
        _prefixed_zfill("c", np.arange(n_conv) + conv_offset, 6), lengths
    )
    # contiguous 0..len-1 per conversation (stable ordering key)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    turn_idx = (np.arange(total) - np.repeat(starts, lengths)).astype(np.int32)

    # roles: turn 0 is 'system' w.p. 0.2 (per conversation), else
    # alternate user/assistant starting with user.
    sys_first = rng.rand(n_conv) < 0.2
    offset = np.repeat(sys_first.astype(np.int32), lengths)
    role = np.where(
        (turn_idx == 0) & np.repeat(sys_first, lengths),
        "system",
        np.where((turn_idx - offset) % 2 == 0, "user", "assistant"),
    )

    # tools: only on assistant turns, w.p. tool_prob, Zipf-ranked ids so a
    # handful of hub tools dominate (skew/salting exercise).
    zipf_rank = (rng.zipf(zipf_s, size=total) - 1) % n_tools
    has_tool = (role == "assistant") & (rng.rand(total) < tool_prob)
    tool = np.where(has_tool, _prefixed_zfill("t", zipf_rank, 3), None)

    # text: deterministic per-turn prefix + seeded token soup; must
    # round-trip byte-equal under (conv_id, turn_idx) ordering. String
    # assembly runs through pyarrow compute kernels (single C++ pass per
    # column): the previous np.char.add chain re-allocated the whole
    # 600k-row text column once per concat operand and was the dominant
    # cost of the bench's synth_write stage (8.4s of 14.3s measured
    # driver-side). Identical bytes — rng draws and logical values are
    # unchanged, only the concatenation engine differs.
    soup = _WORDS[rng.randint(0, len(_WORDS), size=(total, 4))]
    text = _join_arrow(
        "turn ", conv_id, ":", turn_idx.astype(str), " ",
        soup[:, 0], " ", soup[:, 1], " ", soup[:, 2], " ", soup[:, 3],
    )

    ts = (
        np.datetime64(_BASE_TS.replace(tzinfo=None))
        + np.repeat(conv_idx, 1) * np.timedelta64(300, "s")
        + turn_idx * np.timedelta64(7, "s")
    )

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.to_datetime(ts),
        }
    )


def transcripts_df(spark: SparkSession, preset: str = "tiny", **overrides) -> DataFrame:
    """Generate transcripts as a Spark DataFrame with the pinned schema.

    Presets above _CHUNK_CONVS conversations generate in chunks (disjoint
    conv-id ranges, per-chunk seeds) and union — peak driver memory stays
    one chunk regardless of preset size.
    """
    params = dict(PRESETS.get(preset, {}))
    params.update(overrides)
    n_conv = params.get("n_conv", 200)

    def _to_spark(pdf):
        # hand Spark a pyarrow Table, not the pandas frame: the pandas
        # path re-converts every object-dtype string column row-by-row
        # (measured 2.9s vs 0.12+0.95s for from_pandas + arrow-table
        # createDataFrame at the 600k-row bench preset; written rows
        # byte-identical both ways, exceptAll-verified)
        import pyarrow as pa

        return spark.createDataFrame(
            pa.Table.from_pandas(pdf, preserve_index=False), schema=TRANSCRIPTS
        )

    if n_conv <= _CHUNK_CONVS:
        return _to_spark(transcripts_pandas(**params))
    base_seed = params.get("seed", 42)
    out = None
    for i, start in enumerate(range(0, n_conv, _CHUNK_CONVS)):
        chunk = dict(
            params,
            n_conv=min(_CHUNK_CONVS, n_conv - start),
            seed=base_seed + i,
            conv_offset=start,
        )
        df = _to_spark(transcripts_pandas(**chunk))
        out = df if out is None else out.unionByName(df)
    return out
