"""Deterministic synthetic transcript corpus with planted ground truth.

Implements the FIXTURES.md spec: fixture families plant known duplicate
structure so dup-pair recall and cluster assignments are checkable
against an oracle. Pure pandas/numpy (no Spark) so tests and the bench
generator stay fast; seed-stable across runs (seed=42 default).

Output tables:
  turns(conv_id, turn_idx, role, text, tool, ts)
  oracle_pairs(conv_a, conv_b, kind)           conv_a < conv_b
  oracle_clusters(conv_id, cluster_id)         cluster_id = min conv_id
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

_VOCAB_A = [
    "plan", "query", "table", "join", "merge", "sort", "scan", "filter",
    "group", "batch", "stream", "spark", "shuffle", "window", "hash",
    "token", "model", "agent", "tool", "call", "result", "error", "retry",
    "cache", "index", "value", "order", "range", "split", "count",
]
_VOCAB_B = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu",
]
VOCAB = [f"{a}_{b}" for a in _VOCAB_A for b in _VOCAB_B]  # 780 tokens

ROLES = ["user", "assistant"]
TOOLS = ["search", "python", "browser", "calculator"]

BOILERPLATE = (
    "system policy preamble please follow the assistant guidelines "
    "carefully and respond helpfully to the user at all times " * 3
).strip()

BASE_TS = np.datetime64("2026-01-01T00:00:00")


@dataclass
class CorpusSpec:
    n_convs: int = 200
    seed: int = 42
    # Vocabulary must grow LINEARLY with corpus size: real language has
    # an effectively unbounded 17-char/25-char window space, so chance
    # cross-conversation window collisions are rare outside genuine
    # duplication. A sublinear vocab (the earlier 64*sqrt(n)) makes the
    # 2-3-token window space smaller than the number of windows, so
    # random collisions grow ~n^2 — inflating shingle DF into the
    # informative band and flooding the suffix-anchor pass with noise
    # pairs (measured: half of ALL suffix keys repeated at n=8000).
    # None → max(len(VOCAB), 8*n_convs).
    vocab_size: int | None = None
    frac_exact: float = 0.05
    frac_near: float = 0.15
    frac_substring: float = 0.08
    frac_boiler: float = 0.10
    frac_chain: float = 0.02
    n_tiny: int = 4
    min_turns: int = 3
    max_turns: int = 40
    min_turn_tokens: int = 8
    max_turn_tokens: int = 60
    near_edit_frac_lo: float = 0.01
    near_edit_frac_hi: float = 0.10


def build_vocab(size: int) -> list[str]:
    """Deterministic vocabulary of ``size`` tokens (VOCAB + suffixed)."""
    if size <= len(VOCAB):
        return VOCAB[:size]
    out = list(VOCAB)
    i = 0
    while len(out) < size:
        out.append(f"{VOCAB[i % len(VOCAB)]}{i // len(VOCAB)}")
        i += 1
    return out


def _rand_turns(rng: np.random.Generator, spec: CorpusSpec, vocab: list[str]) -> list[str]:
    n = int(rng.integers(spec.min_turns, spec.max_turns + 1))
    out = []
    for _ in range(n):
        m = int(rng.integers(spec.min_turn_tokens, spec.max_turn_tokens + 1))
        idx = rng.integers(0, len(vocab), size=m)
        out.append(" ".join(vocab[i] for i in idx))
    return out


def _edit_turns(
    rng: np.random.Generator, turns: list[str], frac: float, vocab: list[str]
) -> list[str]:
    """Substitute ~frac of tokens across all turns (near-dup family)."""
    out = []
    for t in turns:
        toks = t.split()
        n_edit = max(0, int(round(len(toks) * frac)))
        if n_edit:
            pos = rng.choice(len(toks), size=min(n_edit, len(toks)), replace=False)
            for p in pos:
                toks[p] = vocab[int(rng.integers(0, len(vocab)))]
        out.append(" ".join(toks))
    return out


def generate_corpus(spec: CorpusSpec | None = None):
    """→ (turns_df, oracle_pairs_df, oracle_clusters_df) as pandas."""
    spec = spec or CorpusSpec()
    rng = np.random.Generator(np.random.PCG64(spec.seed))
    vsize = spec.vocab_size or max(len(VOCAB), int(8 * spec.n_convs))
    vocab = build_vocab(vsize)

    convs: dict[str, list[str]] = {}
    pairs: list[tuple[str, str, str]] = []

    n = spec.n_convs
    n_exact = max(1, int(n * spec.frac_exact))
    n_near = max(1, int(n * spec.frac_near))
    n_sub = max(1, int(n * spec.frac_substring))
    n_boiler = max(2, int(n * spec.frac_boiler))
    n_chain_groups = max(1, int(n * spec.frac_chain) // 4)
    counter = 0

    def new_id() -> str:
        nonlocal counter
        cid = f"c{counter:07d}"
        counter += 1
        return cid

    # unique base conversations (fill whatever the families don't use)
    n_family = n_exact * 2 + n_near * 2 + n_sub * 2 + n_boiler + n_chain_groups * 4 + spec.n_tiny
    n_unique = max(0, n - n_family)
    for _ in range(n_unique):
        convs[new_id()] = _rand_turns(rng, spec, vocab)

    # exact duplicates: verbatim copy under a new id (MinHash identity)
    for _ in range(n_exact):
        a, b = new_id(), new_id()
        base = _rand_turns(rng, spec, vocab)
        convs[a] = base
        convs[b] = list(base)
        pairs.append((a, b, "exact_dup"))

    # near duplicates: 1–10% token substitutions spread over turns
    for _ in range(n_near):
        a, b = new_id(), new_id()
        base = _rand_turns(rng, spec, vocab)
        frac = rng.uniform(spec.near_edit_frac_lo, spec.near_edit_frac_hi)
        convs[a] = base
        convs[b] = _edit_turns(rng, base, frac, vocab)
        pairs.append((a, b, "near_dup"))

    # substring duplicates: B embeds a long contiguous span of A
    for _ in range(n_sub):
        a, b = new_id(), new_id()
        base = _rand_turns(rng, spec, vocab)
        span_len = max(2, int(len(base) * rng.uniform(0.3, 0.6)))
        start = int(rng.integers(0, max(1, len(base) - span_len)))
        span = base[start : start + span_len]
        filler_pre = _rand_turns(rng, spec, vocab)[: max(1, int(rng.integers(1, 6)))]
        filler_post = _rand_turns(rng, spec, vocab)[: max(1, int(rng.integers(1, 6)))]
        convs[a] = base
        convs[b] = filler_pre + span + filler_post
        pairs.append((a, b, "substring_dup"))

    # boilerplate: unrelated convs sharing one identical first turn
    for _ in range(n_boiler):
        cid = new_id()
        convs[cid] = [BOILERPLATE] + _rand_turns(rng, spec, vocab)

    # chains A≈B≈C≈D: adjacent pairs above threshold, A–D only transitive
    for _ in range(n_chain_groups):
        ids = [new_id() for _ in range(4)]
        cur = _rand_turns(rng, spec, vocab)
        convs[ids[0]] = cur
        for i in range(1, 4):
            cur = _edit_turns(rng, cur, 0.08, vocab)
            convs[ids[i]] = list(cur)
            pairs.append((ids[i - 1], ids[i], "chain"))

    # tiny: 1-turn and empty-text conversations (empty-shingle guard)
    for i in range(spec.n_tiny):
        cid = new_id()
        convs[cid] = [""] if i % 2 == 0 else ["ok"]

    # ---- assemble the turns table ----
    rows = []
    conv_ids = sorted(convs)
    for cid in conv_ids:
        day_offset = np.timedelta64(int(rng.integers(0, 365)), "D")
        for idx, text in enumerate(convs[cid]):
            role = ROLES[idx % 2]
            tool = TOOLS[idx % len(TOOLS)] if (idx % 5 == 3) else None
            ts = BASE_TS + day_offset + np.timedelta64(idx * 61, "s")
            rows.append((cid, idx, role, text, tool, ts))
    turns = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    turns["turn_idx"] = turns["turn_idx"].astype("int32")
    turns["ts"] = pd.to_datetime(turns["ts"])

    canon = [(min(a, b), max(a, b), k) for a, b, k in pairs]
    oracle_pairs = pd.DataFrame(canon, columns=["conv_a", "conv_b", "kind"])

    # transitive closure of planted pairs → clusters (min-id label)
    parent: dict[str, str] = {c: c for c in conv_ids}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, kind in canon:
        if kind == "substring_dup":
            continue  # substring overlap is not whole-conv duplication
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    oracle_clusters = pd.DataFrame(
        [(c, find(c)) for c in conv_ids], columns=["conv_id", "cluster_id"]
    )
    return turns, oracle_pairs, oracle_clusters
