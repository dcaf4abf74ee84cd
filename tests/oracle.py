"""Single-threaded pandas oracle for CDC replay (SURVEY.md §5 item 2):
sort by LSN, last-writer-wins, deletes remove, full-row replace (columns
absent from a writer's payload become null). Used to verify the engine's
final table state including per-row sha256(content)."""

from __future__ import annotations

import hashlib

import pandas as pd

_LANG_ALIASES = {
    "py": "python", "py3": "python", "python3": "python", "python": "python",
    "scala": "scala", "sc": "scala",
    "java": "java",
    "go": "go", "golang": "go",
    "rust": "rust", "rs": "rust",
    "markdown": "markdown", "md": "markdown", "mdown": "markdown",
    "unknown": "unknown",
}


def canonicalize(text):
    if text is None or (isinstance(text, float) and pd.isna(text)):
        return None
    t = text.replace("\r\n", "\n").replace("\r", "\n")
    t = "\n".join(line.rstrip(" \t") for line in t.split("\n"))
    t = t.rstrip(" \t\n")
    return t + "\n"


def norm_lang(x):
    if x is None or (isinstance(x, float) and pd.isna(x)):
        return None
    return _LANG_ALIASES.get(str(x).strip().lower(), "unknown")


def sha256(text):
    if text is None:
        return None
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def replay_oracle(events: pd.DataFrame, key_cols=("repo", "path")) -> pd.DataFrame:
    """Apply events in LSN order; return final state dataframe."""
    events = events.sort_values(["lsn", "ts", "op"], kind="mergesort")
    state: dict[tuple, dict] = {}
    all_cols: list[str] = []
    for c in events.columns:
        if c != "op" and c not in all_cols:
            all_cols.append(c)
    for rec in events.to_dict("records"):
        key = tuple(rec[k] for k in key_cols)
        if rec["op"] == "delete":
            state.pop(key, None)
            continue
        row = {c: rec.get(c) for c in all_cols}
        row["lang"] = norm_lang(row.get("lang"))
        row["content"] = canonicalize(row.get("content"))
        row["content_sha256"] = sha256(row.get("content"))
        state[key] = row
    cols = all_cols + ["content_sha256"]
    if not state:
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(list(state.values()))[cols]
