"""Pipeline: a Tez-style DAG façade over DataFrame composition.

Reference parity: Tez programs build a DAG of Vertices connected by Edges
(`tez-api/.../dag/api/DAG.java:80` — `create` :111, `addVertex` :129,
`addEdge` :278; `Vertex.java:49`; edge semantics `EdgeProperty.java:44-66`)
and submit it as one unit. This module reproduces that *programming model*
— named nodes, explicit edges, vertex groups — while execution stays pure
DataFrame: the assembled graph is just composed transformations, so
Catalyst sees one logical plan per sink and optimizes across every
"vertex" boundary (something Tez structurally cannot do: its vertices are
opaque user code).

Edge movement types map per SURVEY §1.3:

- ONE_TO_ONE       -> plain DataFrame hand-off (narrow; same stage)
- BROADCAST        -> F.broadcast() wrapping of the producer output
- SCATTER_GATHER   -> repartition(n, keys) hash shuffle
- (VertexGroup)    -> unionByName of the member outputs

A vertex's `fn` receives a dict of named upstream DataFrames (the Tez
LogicalInput map — `LogicalIOProcessorRuntimeTask.java:421-427`) and
returns a DataFrame (its LogicalOutput).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ONE_TO_ONE = "one_to_one"
BROADCAST = "broadcast"
SCATTER_GATHER = "scatter_gather"

VertexFn = Callable[[Mapping[str, DataFrame]], DataFrame]


@dataclass
class _Vertex:
    name: str
    fn: VertexFn | None = None          # None for source vertices
    source: DataFrame | None = None
    members: tuple[str, ...] = ()        # for vertex groups


@dataclass
class _Edge:
    src: str
    dst: str
    movement: str = ONE_TO_ONE
    keys: Sequence[str] = ()
    num_partitions: int | None = None


class ObjectRegistry:
    """Cross-query cached-object registry — parity with Tez's in-executor
    `ObjectRegistry` (`tez-api/.../runtime/api/ObjectRegistry.java:37-61`,
    impl `tez-runtime-internals/.../objectregistry/ObjectRegistryImpl.java`):
    Tez lets tasks stash objects scoped to VERTEX / DAG / SESSION so later
    tasks in the same container reuse them. The Spark equivalent of "keep
    this hot across jobs" is a persisted DataFrame (executor-resident
    blocks) — this registry names and scopes them.

    Scope is advisory bookkeeping (clear('dag') between pipelines ≈ Tez
    DAG-scope eviction); storage is Spark's block manager either way.
    """

    def __init__(self) -> None:
        self._entries: dict[str, tuple[DataFrame, str]] = {}

    def cache(self, name: str, df: DataFrame, scope: str = "session") -> DataFrame:
        """Register and persist (MEMORY_AND_DISK). Returns the cached df."""
        if scope not in ("vertex", "dag", "session"):
            raise ValueError(f"unknown scope {scope!r}")
        if name in self._entries:
            raise ValueError(f"duplicate registry entry {name!r}")
        cached = df.persist()
        self._entries[name] = (cached, scope)
        return cached

    def get(self, name: str) -> DataFrame | None:
        entry = self._entries.get(name)
        return entry[0] if entry else None

    def drop(self, name: str) -> None:
        df, _ = self._entries.pop(name)
        df.unpersist()

    def clear(self, scope: str | None = None) -> None:
        """Evict everything in `scope` (or everything)."""
        for name in [
            n for n, (_, s) in self._entries.items() if scope in (None, s)
        ]:
            self.drop(name)


class Pipeline:
    """Composable DAG of named vertices (Tez DAG.create parity).

    >>> p = Pipeline("wordcount")
    >>> p.source("lines", df)
    >>> p.vertex("tokenize", lambda ins: explode_tokens(ins["lines"], "text"))
    >>> p.edge("lines", "tokenize")
    >>> p.vertex("count", lambda ins: ins["tokenize"].groupBy("word").count())
    >>> p.edge("tokenize", "count", movement=SCATTER_GATHER, keys=["word"])
    >>> out = p.run()["count"]
    """

    def __init__(self, name: str):
        self.name = name
        self._vertices: dict[str, _Vertex] = {}
        self._edges: list[_Edge] = []

    # -- graph assembly (DAG.addVertex / addEdge / createVertexGroup) ------

    def source(self, name: str, df: DataFrame) -> "Pipeline":
        """A data-source vertex (DataSourceDescriptor parity)."""
        self._add(_Vertex(name, source=df))
        return self

    def vertex(self, name: str, fn: VertexFn) -> "Pipeline":
        self._add(_Vertex(name, fn=fn))
        return self

    def edge(
        self,
        src: str,
        dst: str,
        movement: str = ONE_TO_ONE,
        keys: Sequence[str] = (),
        num_partitions: int | None = None,
    ) -> "Pipeline":
        if movement not in (ONE_TO_ONE, BROADCAST, SCATTER_GATHER):
            raise ValueError(f"unknown movement {movement!r}")
        if movement == SCATTER_GATHER and not keys:
            raise ValueError("scatter_gather edges need partition keys")
        self._edges.append(_Edge(src, dst, movement, tuple(keys), num_partitions))
        return self

    def vertex_group(self, name: str, members: Sequence[str]) -> "Pipeline":
        """UNION of member vertex outputs (VertexGroup.java parity)."""
        self._add(_Vertex(name, members=tuple(members)))
        return self

    def _add(self, v: _Vertex) -> None:
        if v.name in self._vertices:
            raise ValueError(f"duplicate vertex {v.name!r}")
        self._vertices[v.name] = v

    # -- execution ----------------------------------------------------------

    def _toposort(self) -> list[str]:
        indeg = {n: 0 for n in self._vertices}
        for e in self._edges:
            for end in (e.src, e.dst):
                if end not in self._vertices:
                    raise ValueError(f"edge references unknown vertex {end!r}")
            indeg[e.dst] += 1
        for v in self._vertices.values():
            for m in v.members:
                indeg[v.name] += 1
        order, ready = [], sorted(n for n, d in indeg.items() if d == 0)
        out_edges: dict[str, list[str]] = {n: [] for n in self._vertices}
        for e in self._edges:
            out_edges[e.src].append(e.dst)
        for v in self._vertices.values():
            for m in v.members:
                out_edges[m].append(v.name)
        while ready:
            n = ready.pop(0)
            order.append(n)
            for d in sorted(out_edges[n]):
                indeg[d] -= 1
                if indeg[d] == 0:
                    ready.append(d)
        if len(order) != len(self._vertices):
            cyclic = sorted(set(self._vertices) - set(order))
            raise ValueError(f"cycle in pipeline involving {cyclic}")
        return order

    def run(self) -> dict[str, DataFrame]:
        """Assemble every vertex output. Lazy: returns DataFrames; actions
        (driver's collect / writes) trigger execution, one Catalyst plan
        per sink — the whole DAG optimizes as a unit."""
        results: dict[str, DataFrame] = {}
        in_edges: dict[str, list[_Edge]] = {n: [] for n in self._vertices}
        for e in self._edges:
            in_edges[e.dst].append(e)
        for name in self._toposort():
            v = self._vertices[name]
            if v.source is not None:
                results[name] = v.source
                continue
            if v.members:
                dfs = [results[m] for m in v.members]
                out = dfs[0]
                for d in dfs[1:]:
                    out = out.unionByName(d)
                results[name] = out
                continue
            inputs: dict[str, DataFrame] = {}
            for e in in_edges[name]:
                df = results[e.src]
                if e.movement == BROADCAST:
                    df = F.broadcast(df)
                elif e.movement == SCATTER_GATHER:
                    parts = [e.num_partitions] if e.num_partitions else []
                    df = df.repartition(*parts, *[F.col(k) for k in e.keys])
                inputs[e.src] = df
            if v.fn is None:
                raise ValueError(f"vertex {name!r} has neither fn nor source")
            results[name] = v.fn(inputs)
        return results
