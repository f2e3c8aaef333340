"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Generates the `transcripts(conv_id, turn_idx, role, text, tool, ts)` table —
the authoritative input shape from BASELINE.json `input_hint` — with planted
structure driving the test matrix:

- exact duplicate conversations (same turns, new conv_id)
- near-duplicate families at graded word-level edit rates (1%, 5%, 20%)
- exact-substring duplicates (a conversation embedded verbatim in a longer one)
- a hot boilerplate greeting turn in ~30% of conversations (the skewed LSH
  band bucket that the salting logic must survive)
- adler32 weak-hash collision turn pair ("baab…" vs "abba…" block patterns:
  equal s1 AND s2, so full 32-bit collisions) that must NOT merge — mirrors
  the byte-verify semantics of /root/reference/src/dedup.c:232-292
- turn length mix: mostly < 512 B (tail/min-block edges), a few > 32 KB
  (max-block forced cuts)

Everything is seeded; the planted ground-truth pair list is returned alongside
so recall can be measured (BASELINE.json: dup-pair recall ≥ 0.99).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

_GREETING = (
    "hello thanks for contacting support today how can i help you with your "
    "account billing or technical issue please describe the problem in detail"
)

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["search", "calculator", "browser", "python", "sql"])


@dataclass
class SynthResult:
    transcripts: pd.DataFrame      # conv_id, turn_idx, role, text, tool, ts
    truth_pairs: pd.DataFrame      # conv_a, conv_b, kind, edit_rate


def _vocab(rng: np.random.Generator, size: int = 4000) -> np.ndarray:
    common = np.array(
        "the a of to and in is it you that was for on are with as his they be "
        "at one have this from or had by word but what some we can out other "
        "were all there when up use your how said an each she".split()
    )
    synth = np.array([f"tok{i:04d}" for i in range(size - len(common))])
    return np.concatenate([common, synth])


def _turn_text(rng: np.random.Generator, vocab: np.ndarray, long: bool = False) -> str:
    if long:
        n = int(rng.integers(7000, 9000))  # > 32 KB once joined
    else:
        # mostly short turns (< 512 B), some mid-size
        n = int(rng.choice([8, 15, 30, 60, 120, 400], p=[0.25, 0.25, 0.2, 0.15, 0.1, 0.05]))
    words = vocab[rng.integers(0, len(vocab), n)]
    return " ".join(words.tolist())


def _mutate(rng: np.random.Generator, text: str, rate: float, vocab: np.ndarray) -> str:
    words = np.array(text.split())
    if len(words) == 0:
        return text
    mask = rng.random(len(words)) < rate
    if mask.any():
        words = words.copy()
        words[mask] = vocab[rng.integers(0, len(vocab), int(mask.sum()))]
    return " ".join(words.tolist())


def synthesize(
    n_base_convs: int = 150,
    seed: int = 42,
    dup_fraction: float = 0.30,
) -> SynthResult:
    """Build the corpus.  ~`n_base_convs` originals + planted duplicate convs."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)

    conv_rows: list[tuple[str, int, str, str, str | None]] = []
    convs: dict[str, list[tuple[str, str, str | None]]] = {}  # conv_id -> [(role, text, tool)]

    def add_conv(cid: str, turns: list[tuple[str, str, str | None]]) -> None:
        convs[cid] = turns
        for idx, (role, text, tool) in enumerate(turns):
            conv_rows.append((cid, idx, role, text, tool))

    # --- base conversations ---
    for i in range(n_base_convs):
        cid = f"c{i:06d}"
        n_turns = int(rng.integers(3, 25))
        turns: list[tuple[str, str, str | None]] = []
        if rng.random() < 0.30:
            turns.append(("assistant", _GREETING, None))
        for t in range(n_turns):
            role = str(_ROLES[rng.choice([0, 1, 1, 2], p=[0.4, 0.25, 0.25, 0.1])])
            tool = str(_TOOLS[rng.integers(0, len(_TOOLS))]) if role == "tool" else None
            long = rng.random() < 0.01
            turns.append((role, _turn_text(rng, vocab, long=long), tool))
        add_conv(cid, turns)

    base_ids = list(convs.keys())
    truth: list[tuple[str, str, str, float]] = []
    next_id = n_base_convs

    # --- planted duplicates ---
    n_dups = int(n_base_convs * dup_fraction)
    kinds = ["exact", "near_0.01", "near_0.05", "near_0.20", "substring"]
    for k in range(n_dups):
        src = base_ids[int(rng.integers(0, len(base_ids)))]
        kind = kinds[k % len(kinds)]
        cid = f"c{next_id:06d}"
        next_id += 1
        src_turns = convs[src]
        if kind == "exact":
            add_conv(cid, list(src_turns))
            truth.append((min(src, cid), max(src, cid), "exact", 0.0))
        elif kind.startswith("near_"):
            rate = float(kind.split("_")[1])
            turns = [(r, _mutate(rng, t, rate, vocab), tl) for (r, t, tl) in src_turns]
            add_conv(cid, turns)
            truth.append((min(src, cid), max(src, cid), "near", rate))
        else:  # substring: src embedded verbatim inside a longer conversation
            pre = [("user", _turn_text(rng, vocab), None) for _ in range(int(rng.integers(1, 3)))]
            post = [("assistant", _turn_text(rng, vocab), None) for _ in range(int(rng.integers(1, 3)))]
            add_conv(cid, pre + list(src_turns) + post)
            truth.append((min(src, cid), max(src, cid), "substring", 0.0))

    # --- adler32 weak-collision pair (must NOT cluster) ---
    # 'baab' vs 'abba' blocks: byte sums AND positional weighted sums equal ->
    # identical adler32, different bytes (byte-verify separation test).
    # distinct fillers: the pair must collide at the CHUNK weak-hash level
    # (equal adler32, different bytes) without being textual near-duplicates
    filler_a = " ".join(vocab[rng.integers(0, len(vocab), 200)].tolist())
    filler_b = " ".join(vocab[rng.integers(0, len(vocab), 200)].tolist())
    ca, cb = f"c{next_id:06d}", f"c{next_id + 1:06d}"
    next_id += 2
    add_conv(ca, [("user", "baab " * 200 + filler_a, None)])
    add_conv(cb, [("user", "abba " * 200 + filler_b, None)])
    truth.append((ca, cb, "collision_nonpair", 0.0))

    # --- assemble frame ---
    df = pd.DataFrame(conv_rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    base_ts = pd.Timestamp("2026-01-01 00:00:00")
    df["ts"] = base_ts + pd.to_timedelta(
        pd.util.hash_pandas_object(df["conv_id"], index=False).astype("int64").abs() % 86_400, unit="s"
    ) + pd.to_timedelta(df["turn_idx"] * 60, unit="s")
    # Spark's parquet reader rejects TIMESTAMP(NANOS); write microseconds
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["turn_idx"] = df["turn_idx"].astype("int32")

    truth_df = pd.DataFrame(truth, columns=["conv_a", "conv_b", "kind", "edit_rate"])
    return SynthResult(transcripts=df, truth_pairs=truth_df)


def write_corpus(out_dir: str, n_base_convs: int = 150, seed: int = 42) -> SynthResult:
    """Materialize transcripts + truth_pairs as parquet under `out_dir`."""
    res = synthesize(n_base_convs=n_base_convs, seed=seed)
    os.makedirs(out_dir, exist_ok=True)
    # small row groups: a single multi-GB row group is an UNSPLITTABLE scan
    # unit — one Spark task would read the whole corpus (serialized assembly)
    res.transcripts.to_parquet(
        os.path.join(out_dir, "transcripts.parquet"), index=False, row_group_size=20_000
    )
    res.truth_pairs.to_parquet(os.path.join(out_dir, "truth_pairs.parquet"), index=False)
    return res
