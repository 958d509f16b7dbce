"""Hotword context-biasing graph for beam search.

Parity: wenet/utils/context_graph.py (Aho-Corasick-style trie whose states
score partial hotword matches step by step; used by CTC prefix beam search at
wenet/transformer/search.py:99-104, 169-231).

TPU design: the trie + fail-link closure is built host-side (numpy) into two
dense tables — ``next_state [num_nodes, V]`` and ``score_delta [num_nodes,
V]`` — so the per-frame beam update is a pure gather: extending a prefix with
token ``u`` from graph state ``s`` moves to ``next_state[s, u]`` and adds
``score_delta[s, u]`` to the hypothesis score. `finalize_score[state]`
removes the bonus of dangling partial matches at end of decode (wenet
`finalize` parity)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ContextGraph:
    next_state: np.ndarray  # [N, V] int32
    score_delta: np.ndarray  # [N, V] float32
    node_score: np.ndarray  # [N] float32 accumulated partial-match bonus
    num_nodes: int

    @property
    def finalize_score(self) -> np.ndarray:
        """Score to ADD at end of decode per state (removes partial bonus)."""
        return -self.node_score


def build_context_graph(
    hotwords: list[list[int]], vocab_size: int, context_score: float = 2.0
) -> ContextGraph:
    """Build the dense AC automaton from token-id hotword sequences.

    Matching semantics (wenet context_graph.py): each matched token adds
    `context_score`; completing a hotword keeps its full bonus permanently
    (state falls back through suffix links); breaking a partial match forfeits
    the partial bonus (handled by score_delta against the fail target's
    score).
    """
    # trie
    children: list[dict[int, int]] = [{}]
    depth = [0]
    is_end = [False]
    for seq in hotwords:
        node = 0
        for tok in seq:
            if tok not in children[node]:
                children.append({})
                depth.append(depth[node] + 1)
                is_end.append(False)
                children[node][tok] = len(children) - 1
            node = children[node][tok]
        is_end[node] = True

    n = len(children)
    # node_score: bonus accumulated on the path, but completed words are
    # "banked": score tracks only the un-banked partial depth.
    # partial score of node = depth * context_score minus banked complete
    # words along the suffix chain; for simplicity bank at completion:
    fail = np.zeros(n, np.int32)
    order = []
    from collections import deque

    q = deque()
    for tok, ch in children[0].items():
        fail[ch] = 0
        q.append(ch)
    while q:
        u = q.popleft()
        order.append(u)
        for tok, ch in children[u].items():
            # fail link: longest proper suffix that is also a trie prefix
            f = fail[u]
            while f != 0 and tok not in children[f]:
                f = fail[f]
            fail[ch] = children[f][tok] if (tok in children[f] and children[f][tok] != ch) else 0
            q.append(ch)

    node_score = np.array([depth[i] * context_score for i in range(n)], np.float32)

    next_state = np.zeros((n, vocab_size), np.int32)
    score_delta = np.zeros((n, vocab_size), np.float32)
    for u in range(n):
        for tok in range(vocab_size):
            s = u
            while s != 0 and tok not in children[s]:
                s = fail[s]
            v = children[s].get(tok, 0)
            # every transition scores the change in un-banked partial bonus;
            # completing a hotword BANKS its bonus permanently: the state
            # falls back to v's suffix state (so overlapping matches keep
            # going) and the suffix's partial bonus is credited anew — a later
            # mismatch/finalize only retracts that smaller partial score.
            if is_end[v]:
                score_delta[u, tok] = node_score[v] - node_score[u] + node_score[fail[v]]
                next_state[u, tok] = fail[v]
            else:
                score_delta[u, tok] = node_score[v] - node_score[u]
                next_state[u, tok] = v
    return ContextGraph(next_state, score_delta, node_score, n)
