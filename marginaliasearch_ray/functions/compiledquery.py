"""Compiled index queries — the boolean expression the index executes.

Faithful re-expression of the query-service API's compiled-query model
(functions/search-query/api/.../model/compiled/):

- ``parse_compiled_query`` — CompiledQueryParser.java:8-128: the n-ary
  and/or parse of the infix expression QueryExpansion renders
  ("foo ( bar | baz ) quux"), with word interning in first-appearance
  order, the Ignore leaf expressing optional branches ("( bar | )"),
  and the empty-group collapse rules ("( | )" == empty).
- ``CqAnd`` / ``CqOr`` / ``CqWord`` / ``CQ_IGNORE`` — CqExpression.java:
  14-149, including ``paths()`` (the cartesian path expansion through
  and-nodes) and ``all_paths`` (sort+unique per path, dedup across
  paths, empty paths dropped).
- aggregates — aggregate/CompiledQueryAggregates.java:13-231: boolean
  (exists a path where every leaf satisfies the predicate), 64-bit
  bitmask (AND along paths, OR across), int max-min (the best
  worst-leaf), max-sum-of-indexes (tropical semiring), and the
  queries_aggregate path enumeration the index uses to plan term
  lookups.

The index walks these paths per candidate document (SearchContext /
IndexResultRankingService); ``stages`` code evaluates them vectorized
per batch with the same semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

_M64 = (1 << 64) - 1


class CqExpression:
    def paths(self) -> list[list[int]]:
        raise NotImplementedError


@dataclass(frozen=True)
class CqWord(CqExpression):
    idx: int

    def paths(self) -> list[list[int]]:
        return [[self.idx]]


@dataclass(frozen=True)
class CqIgnore(CqExpression):
    def paths(self) -> list[list[int]]:
        return [[]]


CQ_IGNORE = CqIgnore()


@dataclass(frozen=True)
class CqAnd(CqExpression):
    parts: tuple[CqExpression, ...]

    def paths(self) -> list[list[int]]:
        if not self.parts:
            return []
        if len(self.parts) == 1:
            return self.parts[0].paths()
        ret = self.parts[0].paths()
        for part in self.parts[1:]:
            to_combine = part.paths()
            ret = [a + b for a in ret for b in to_combine]
        return ret


@dataclass(frozen=True)
class CqOr(CqExpression):
    parts: tuple[CqExpression, ...]

    def paths(self) -> list[list[int]]:
        out: list[list[int]] = []
        for part in self.parts:
            out.extend(part.paths())
        return out


CQ_EMPTY = CqOr(())


def all_paths(expression: CqExpression) -> list[list[int]]:
    """CqExpression.allPaths (java:23-41): drop empty paths, sort+unique
    within each path, dedup across paths preserving first appearance."""
    raw = expression.paths()
    if not raw:
        return raw
    seen: set[tuple[int, ...]] = set()
    ret: list[list[int]] = []
    for lst in raw:
        if not lst:
            continue
        key = tuple(sorted(set(lst)))
        if key not in seen:
            seen.add(key)
            ret.append(list(key))
    return ret


@dataclass(frozen=True)
class CompiledQuery:
    root: CqExpression
    paths: tuple[tuple[int, ...], ...]
    data: tuple[str, ...]  # word at each interned index


class _AndOrState:
    def __init__(self) -> None:
        self.and_state: list[CqExpression] = []
        self.or_state: list[CqExpression] = []

    def and_(self, e: CqExpression) -> None:
        self.and_state.append(e)

    def or_(self) -> None:
        self._flush_and()
        self.and_state = []

    def _flush_and(self) -> None:
        if not self.and_state:
            self.or_state.append(CQ_IGNORE)
        elif len(self.and_state) == 1:
            self.or_state.append(self.and_state[0])
        else:
            self.or_state.append(CqAnd(tuple(self.and_state)))

    def close_or(self) -> CqExpression:
        # java:98-117 — an Ignore branch alongside a real branch keeps
        # optionality; all-empty groups collapse to empty()
        self._flush_and()
        parts: list[CqExpression] = []
        any_real = False
        for e in self.or_state:
            if isinstance(e, CqIgnore):
                parts.append(e)
            elif e != CQ_EMPTY:
                parts.append(e)
                any_real = True
        if not any_real:
            return CQ_EMPTY
        if len(parts) == 1:
            return parts[0]
        return CqOr(tuple(parts))


def parse_compiled_query(query: str) -> CompiledQuery:
    """CompiledQueryParser.parse (java:10-67)."""
    parts = [p for p in query.split(" ") if p.strip()]
    if not parts:
        return CompiledQuery(CQ_EMPTY, (), ())

    paren_state = [_AndOrState()]
    word_ids: dict[str, int] = {}

    for part in parts:
        head = paren_state[-1]
        if part == "|":
            head.or_()
        elif part == "(":
            paren_state.append(_AndOrState())
        elif part == ")":
            if len(paren_state) < 2:
                raise ValueError(
                    f"Mismatched parentheses in expression: {query}"
                )
            closed = paren_state.pop()
            paren_state[-1].and_(closed.close_or())
        else:
            if part not in word_ids:
                word_ids[part] = len(word_ids)
            head.and_(CqWord(word_ids[part]))

    if len(paren_state) != 1:
        raise ValueError(f"Mismatched parentheses in expression: {query}")

    root = paren_state[-1].close_or()
    data = [""] * len(word_ids)
    for w, i in word_ids.items():
        data[i] = w
    return CompiledQuery(
        root,
        tuple(tuple(p) for p in all_paths(root)),
        tuple(data),
    )


# ---------------------------------------------------------------------------
# Aggregates (CompiledQueryAggregates.java)
# ---------------------------------------------------------------------------


def boolean_aggregate(
    query: CompiledQuery, predicate: Callable[[str], bool]
) -> bool:
    """True iff some path satisfies the predicate at every leaf."""
    for path in query.paths:
        if all(predicate(query.data[i]) for i in path):
            return True
    return False


def long_bitmask_aggregate(
    query: CompiledQuery, operator: Callable[[str], int]
) -> int:
    """AND of 64-bit masks along each path, OR across paths."""
    or_result = 0
    for path in query.paths:
        and_result = _M64
        for i in path:
            and_result &= operator(query.data[i]) & _M64
        or_result |= and_result
    return or_result


def int_max_min_aggregate(
    query: CompiledQuery, operator: Callable[[str], int]
) -> int:
    """The best (max over paths) worst (min along path) leaf value."""
    best_path = -(1 << 31)
    for path in query.paths:
        min_for_path = (1 << 31) - 1
        for i in path:
            min_for_path = min(min_for_path, operator(query.data[i]))
        best_path = max(best_path, min_for_path)
    return best_path


def int_max_sum_aggregate_of_indexes(
    paths: Sequence[Sequence[int]], operator: Callable[[int], float]
) -> float:
    """Highest path sum over leaf INDEXES (java:165-183; note the
    upstream's Double.MIN_VALUE floor is the smallest POSITIVE double,
    preserved here as-is)."""
    best_path = 5e-324
    for path in paths:
        s = 0.0
        for i in path:
            s += operator(i)
        best_path = max(best_path, s)
    return best_path


def queries_aggregate(
    query: CompiledQuery, to_id: Callable[[str], int]
) -> list[set[int]]:
    """Per-path term-id sets — the index's query plans (java:210-229)."""
    return [
        {to_id(query.data[i]) for i in path} for path in query.paths
    ]


def demo_compiled_query() -> str:
    """The fixed compiled-query expression the `search_compiled` driver
    query and its sequential replica share, built from the fullrank demo
    terms: (t1 and (t2|t3)) or the never-matching ngram alternative,
    times an optional t3 branch — exercises and/or/ignore paths and the
    ngram-leaf miss."""
    from ..stages.fullrank import RANKED_QUERY

    t1, t2, t3 = RANKED_QUERY
    return f"( {t1} ( {t2} | {t3} ) | {t1}_{t2}_{t3} ) ( {t3} | )"


def bm25_graph_score(
    query: CompiledQuery,
    tf: dict,
    dfs: dict,
    n_docs: int,
    length: int,
    k1: float = 1.2,
    b: float = 0.75,
    avg_length: float = 5000.0,
) -> float:
    """The reference's BM25-over-the-query-graph score: Bm25GraphVisitor
    (index/results/Bm25GraphVisitor.java:11-60 — per-leaf
    invFreq(docCount, df) * (count*(k1+1))/(count + k1*(1-b+b*len/avg)))
    aggregated with intMaxSumAggregateOfIndexes (the best path sum).
    Zero-count leaves contribute 0, so optional branches and missing
    ngram leaves degrade gracefully exactly as upstream."""
    import math

    def leaf(i: int) -> float:
        w = query.data[i]
        count = tf.get(w, 0)
        if count == 0:
            return 0.0
        freq = dfs.get(w, 0)
        inv_freq = math.log(1.0 + (n_docs - freq + 0.5) / (freq + 0.5))
        denom = count + k1 * (1 - b + b * length / avg_length)
        return inv_freq * (count * (k1 + 1)) / denom

    return int_max_sum_aggregate_of_indexes(query.paths, leaf)
