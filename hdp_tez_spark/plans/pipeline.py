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
- RANGE            -> repartitionByRange(n, keys) (total-order routing —
                      the EdgeManagerPlugin range-partitioner use-case,
                      `tez-api/.../dag/api/EdgeManagerPlugin.java:36-143`)
- CUSTOM           -> user movement fn DataFrame -> DataFrame (the full
                      EdgeManagerPlugin escape hatch: any routing that is
                      expressible as a repartitioning transformation)
- (VertexGroup)    -> unionByName of the member outputs

Multi-sink commit: `sink()` + `run_and_commit()` give a DAG with several
file outputs all-or-nothing visibility — parity with Tez committing every
VertexGroup output only at DAG success (`tez-dag/.../dag/impl/DAGImpl.java`
`commitOrAbortOutputs`, pinned by `tez-tests/.../TestTezJobs.java:932,965`).

A vertex's `fn` receives a dict of named upstream DataFrames (the Tez
LogicalInput map — `LogicalIOProcessorRuntimeTask.java:421-427`) and
returns a DataFrame (its LogicalOutput).
"""

from __future__ import annotations

import uuid
from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ONE_TO_ONE = "one_to_one"
BROADCAST = "broadcast"
SCATTER_GATHER = "scatter_gather"
RANGE = "range"
CUSTOM = "custom"

VertexFn = Callable[[Mapping[str, DataFrame]], DataFrame]
MovementFn = Callable[[DataFrame], DataFrame]


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
    movement_fn: MovementFn | None = None


@dataclass
class _Sink:
    vertex: str
    path: str
    fmt: str = "parquet"
    mode: str = "overwrite"


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
        self._sinks: list[_Sink] = []

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
        movement_fn: MovementFn | None = None,
    ) -> "Pipeline":
        if movement not in (ONE_TO_ONE, BROADCAST, SCATTER_GATHER, RANGE, CUSTOM):
            raise ValueError(f"unknown movement {movement!r}")
        if movement in (SCATTER_GATHER, RANGE) and not keys:
            raise ValueError(f"{movement} edges need partition keys")
        if movement == CUSTOM and movement_fn is None:
            raise ValueError("custom edges need a movement_fn")
        if movement != CUSTOM and movement_fn is not None:
            raise ValueError("movement_fn is only valid with CUSTOM movement")
        self._edges.append(
            _Edge(src, dst, movement, tuple(keys), num_partitions, movement_fn)
        )
        return self

    def sink(
        self,
        vertex: str,
        path: str,
        fmt: str = "parquet",
        mode: str = "overwrite",
    ) -> "Pipeline":
        """Register a file output for `vertex`, committed all-or-nothing by
        `run_and_commit` (MROutput + DAG-success commit parity). `mode` is
        'overwrite' or 'error' (fail if the target already exists)."""
        if mode not in ("overwrite", "error"):
            raise ValueError(f"sink mode must be 'overwrite' or 'error', got {mode!r}")
        self._sinks.append(_Sink(vertex, path, fmt, mode))
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
                elif e.movement == RANGE:
                    parts = [e.num_partitions] if e.num_partitions else []
                    df = df.repartitionByRange(*parts, *[F.col(k) for k in e.keys])
                elif e.movement == CUSTOM:
                    df = e.movement_fn(df)
                inputs[e.src] = df
            if v.fn is None:
                raise ValueError(f"vertex {name!r} has neither fn nor source")
            results[name] = v.fn(inputs)
        return results

    def run_and_commit(self) -> dict[str, str]:
        """Execute the DAG and materialize every registered sink with
        all-or-nothing visibility — Tez parity: outputs commit only when the
        whole DAG succeeds (`DAGImpl.commitOrAbortOutputs`; behavior pinned
        by `TestTezJobs.java:932,965` with two MROutputs and one commit
        decision).

        Protocol: every sink writes to a hidden staging directory next to
        its target; only after ALL writes succeed are the stagings renamed
        into place. A failure in any write aborts the DAG: stagings are
        deleted and no target is created or replaced. Renames go through
        the Hadoop FileSystem API, so on HDFS the publish step is a pure
        metadata operation per sink (the same visibility window Tez's
        sequential output commit has; on S3-class stores use a
        rename-free table format for the final hop).

        Returns {vertex: final_path} for the committed sinks.
        """
        if not self._sinks:
            raise ValueError("run_and_commit needs at least one sink()")
        results = self.run()
        missing = [s.vertex for s in self._sinks if s.vertex not in results]
        if missing:
            raise ValueError(f"sink references unknown vertices {missing}")
        spark = results[self._sinks[0].vertex].sparkSession
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        HPath = jvm.org.apache.hadoop.fs.Path

        def fs_for(path: str):
            return HPath(path).getFileSystem(hconf)

        # pre-flight: 'error' sinks must not clobber existing targets,
        # checked before any byte is written
        for s in self._sinks:
            if s.mode == "error" and fs_for(s.path).exists(HPath(s.path)):
                raise FileExistsError(f"sink target already exists: {s.path}")

        token = uuid.uuid4().hex[:12]
        staged = [(s, f"{s.path.rstrip('/')}.__staging-{token}") for s in self._sinks]
        try:
            for s, staging in staged:
                results[s.vertex].write.format(s.fmt).mode("overwrite").save(staging)
        except Exception:
            # abort: remove every staging dir, including the partially
            # written one the failing job left behind
            for _, staging in staged:
                fs = fs_for(staging)
                if fs.exists(HPath(staging)):
                    fs.delete(HPath(staging), True)
            raise
        committed: dict[str, str] = {}
        for s, staging in staged:
            fs = fs_for(s.path)
            target = HPath(s.path)
            if s.mode == "overwrite" and fs.exists(target):
                fs.delete(target, True)
            if not fs.rename(HPath(staging), target):
                raise IOError(f"commit rename failed: {staging} -> {s.path}")
            committed[s.vertex] = s.path
        return committed
