"""Independent pandas replay oracle.

Re-implements the engine semantics record-at-a-time in pandas — the same
role the reference's tests give to brute-force re-derivation
(/root/reference/tests/test_DataCache.py:13-52). Deliberately naive and
shared-nothing with the Spark code: dict state, per-event loop.
"""

from __future__ import annotations

import hashlib

import pandas as pd

NULLISH = {"", "None", "null", "NULL", "N/A"}


def canon(v):
    if v is None or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, str) and v in NULLISH:
        return None
    return v


def digest(lang, content) -> str:
    inner = []
    for v in (canon(lang), canon(content)):
        data = "n:" if v is None else "v:" + str(v)
        inner.append(hashlib.sha256(data.encode()).hexdigest())
    return hashlib.sha256("\x1f".join(inner).encode()).hexdigest()


def replay(base_df: pd.DataFrame, events_df: pd.DataFrame, ignored_repos=()) -> pd.DataFrame:
    """Apply events epoch by epoch: per epoch, LWW winner per key by
    (commit, event_seq) desc, then MERGE semantics with no-op suppression."""
    state: dict[tuple, dict] = {}
    for r in base_df.itertuples(index=False):
        state[(r.repo, r.path)] = {
            "commit": r.commit,
            "lang": canon(r.lang),
            "content": canon(r.content),
        }
    ev = events_df.sort_values(["epoch", "event_seq"]) if "epoch" in events_df else events_df
    for _, epoch_df in ev.groupby("epoch" if "epoch" in events_df else lambda _: 0):
        winners: dict[tuple, tuple] = {}
        for r in epoch_df.itertuples(index=False):
            k = (r.repo, r.path)
            ordkey = (r.commit, r.event_seq)
            if k not in winners or ordkey > (winners[k][0], winners[k][1]):
                winners[k] = (r.commit, r.event_seq, r)
        for k, (_, _, r) in winners.items():
            if r.repo in ignored_repos:
                continue
            if r.op == "DELETE":
                state.pop(k, None)
                continue
            new = {"commit": r.commit, "lang": canon(r.lang), "content": canon(r.content)}
            cur = state.get(k)
            if cur is not None and digest(cur["lang"], cur["content"]) == digest(
                new["lang"], new["content"]
            ):
                continue  # no-op upsert keeps the current row
            state[k] = new
    rows = [
        {"repo": k[0], "path": k[1], **v}
        for k, v in state.items()
    ]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def content_sha_index(df: pd.DataFrame) -> dict[tuple, str]:
    """Per-row invariant map: (repo, path) → sha256(canonical content)."""
    out = {}
    for r in df.itertuples(index=False):
        c = canon(r.content)
        data = "n:" if c is None else "v:" + str(c)
        out[(r.repo, r.path)] = hashlib.sha256(data.encode()).hexdigest()
    return out
