"""Versioned parquet-backed property-graph store with MERGE semantics.

This is the engine's sink layer — the re-expression of the reference's
batched idempotent ``UNWIND … MERGE`` writes
(``cartography/client/core/tx.py:216-237``, generated query
``cartography/graph/querybuilder.py:427-487``) and its staleness cleanup
(``cartography/graph/cleanupbuilder.py``).

Layout::

    <root>/CURRENT                     # JSON pointer {nodes: vN, edges: vM, seq}
    <root>/nodes/v000N/ (parquet, partitioned by label)
    <root>/edges/v000M/ (parquet, partitioned by rel_label)
    <root>/metrics/     (append-only parquet, one row per operation)

Every mutation writes a *new* version directory and atomically swaps the
CURRENT pointer (os.replace) — snapshot isolation + time travel, which is
what drift detection (§2.7 X2) and resume read. **Scale path:** on a real
deployment both tables are Iceberg; ``merge_nodes`` becomes
``MERGE INTO nodes t USING s ON t.label=s.label AND t.id=s.id`` (with
merge-on-read deletes for the sweep) so only touched partitions rewrite.
The join-based implementation below has identical semantics and is what
the semantics tests pin.

MERGE semantics (exact reference contract):
- keyed by (label, id) for nodes / (src, dst, rel_label) for edges;
- ``firstseen`` set only on create (``querybuilder.py:450-459``), never
  touched on update;
- ``lastupdated`` stamped with the run's update_tag on every touch
  (``models/core/nodes.py:20-21``);
- declared props overwrite, undeclared props are retained (MERGE's SET
  only touches declared keys — map_concat LAST_WIN);
- ``id`` is never re-SET (``querybuilder.py:59-61``) — it is the join key.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.window import Window

NODES_SCHEMA = T.StructType(
    [
        T.StructField("label", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("extra_labels", T.ArrayType(T.StringType()), True),
        T.StructField("scope_id", T.StringType(), True),
        T.StructField("firstseen", T.TimestampType(), True),
        T.StructField("lastupdated", T.LongType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("rel_label", T.StringType(), False),
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("src_label", T.StringType(), True),
        T.StructField("dst_label", T.StringType(), True),
        T.StructField("scope_id", T.StringType(), True),
        T.StructField("firstseen", T.TimestampType(), True),
        T.StructField("lastupdated", T.LongType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_NODE_KEY = ["label", "id"]
_EDGE_KEY = ["rel_label", "src", "dst"]


def merge_frames(
    old: DataFrame,
    new: DataFrame,
    key: list[str],
    cols: list[str],
    update_tag: int,
) -> DataFrame:
    """The pure MERGE plan (U1/U2 semantics) as a DataFrame op:
    full-outer join on ``key``; ``firstseen`` preserved on update, set to
    the run timestamp on create; ``lastupdated`` stamped only on touched
    rows; ``props`` merged LAST_WIN (declared keys overwrite, undeclared
    retained). ``new`` must already have unique keys. Extracted from the
    store so query plans can reuse MERGE semantics without a write —
    on Iceberg this exact plan is what MERGE INTO executes."""
    run_ts = F.to_timestamp(F.from_unixtime(F.lit(int(update_tag))))
    new = new.withColumn("__new", F.lit(True))
    old = old.withColumn("__old", F.lit(True))
    j = old.alias("o").join(new.alias("n"), key, "full_outer")
    is_new = F.col("n.__new").isNotNull()
    is_old = F.col("o.__old").isNotNull()

    def merged(c: str) -> F.Column:
        if c in key:
            return F.col(c)
        if c == "firstseen":
            return F.coalesce(F.col("o.firstseen"), run_ts).alias(c)
        if c == "lastupdated":
            return (
                F.when(is_new, F.lit(int(update_tag))).otherwise(F.col("o.lastupdated")).alias(c)
            )
        if c == "props":
            return (
                F.when(
                    is_new & is_old,
                    F.map_concat(
                        F.coalesce(F.col("o.props"), F.expr("map()")),
                        F.coalesce(F.col("n.props"), F.expr("map()")),
                    ),
                )
                .when(is_new, F.col("n.props"))
                .otherwise(F.col("o.props"))
                .alias(c)
            )
        return (
            F.when(is_new, F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")))
            .otherwise(F.col(f"o.{c}"))
            .alias(c)
        )

    return j.select(*[merged(c) for c in cols])


class GraphStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        # Declared-props-overwrite semantics rely on LAST_WIN map merge.
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")

    # ---------- version pointer ----------

    def _pointer(self) -> dict:
        p = os.path.join(self.root, "CURRENT")
        if not os.path.exists(p):
            return {"nodes": None, "edges": None, "seq": 0}
        with open(p) as f:
            return json.load(f)

    def _swap_pointer(self, updates: dict) -> None:
        cur = self._pointer()
        cur.update(updates)
        cur["seq"] = cur.get("seq", 0) + 1
        tmp = os.path.join(self.root, "CURRENT.tmp")
        with open(tmp, "w") as f:
            json.dump(cur, f)
        os.replace(tmp, os.path.join(self.root, "CURRENT"))

    def _new_version(self, table: str) -> str:
        cur = self._pointer()
        n = int((cur.get(table) or "v0")[1:]) + 1
        return f"v{n:06d}"

    # ---------- reads ----------

    def _read(self, table: str, schema: T.StructType, version: str | None = None) -> DataFrame:
        v = version or self._pointer().get(table)
        if v is None:
            return self.spark.createDataFrame([], schema)
        path = os.path.join(self.root, table, v)
        return self.spark.read.schema(schema).parquet(path)

    def read_nodes(self, version: str | None = None) -> DataFrame:
        return self._read("nodes", NODES_SCHEMA, version)

    def read_edges(self, version: str | None = None) -> DataFrame:
        return self._read("edges", EDGES_SCHEMA, version)

    def node_versions(self) -> list[str]:
        d = os.path.join(self.root, "nodes")
        return sorted(os.listdir(d)) if os.path.isdir(d) else []

    # ---------- writes ----------

    def _write(self, table: str, df: DataFrame, partition_col: str) -> str:
        v = self._new_version(table)
        path = os.path.join(self.root, table, v)
        # Sorted-within-partition writes on the lookup key (Iceberg
        # `write.sorted` analog): parquet row-group min/max stats then
        # prune id-range lookups — the layout replacement for the
        # reference's index-ensure step (querybuilder.py:490-551).
        sort_key = "id" if "id" in df.columns else "src"
        (
            df.sortWithinPartitions(sort_key)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
        self._swap_pointer({table: v})
        return v

    def _record_metrics(self, op: str, update_tag: int, counters: dict[str, int]) -> None:
        """Per-operation metrics row (reference analog: statement counters
        harvested to statsd, ``graph/statement.py:105-120`` + per-sync
        ``ModuleSyncMetadata``, ``util.py:136-174``)."""
        row = {
            "op": op,
            "update_tag": int(update_tag),
            "wall_ts": float(time.time()),
            "counters": {k: int(v) for k, v in counters.items()},
        }
        df = self.spark.createDataFrame(
            [row],
            "op string, update_tag long, wall_ts double, counters map<string,long>",
        )
        df.coalesce(1).write.mode("append").parquet(os.path.join(self.root, "metrics"))

    def read_metrics(self) -> DataFrame:
        path = os.path.join(self.root, "metrics")
        if not os.path.isdir(path):
            return self.spark.createDataFrame(
                [], "op string, update_tag long, wall_ts double, counters map<string,long>"
            )
        return self.spark.read.parquet(path)

    # ---------- MERGE ----------

    @staticmethod
    def _dedupe(df: DataFrame, key: list[str]) -> DataFrame:
        """Unique source keys before MERGE (hard requirement of a real
        MERGE INTO; also removes retry duplicates so re-running a
        partition can't double-apply). Deterministic winner: max to_json
        of the full row — order-independent."""
        w = Window.partitionBy(*key).orderBy(F.to_json(F.struct(*df.columns)).desc())
        return (
            df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
        )

    def _merge(
        self,
        table: str,
        schema: T.StructType,
        key: list[str],
        updates: DataFrame,
        update_tag: int,
        partition_col: str,
    ) -> dict[str, int]:
        cols = [f.name for f in schema.fields]
        managed = {"firstseen", "lastupdated"}
        new = self._dedupe(updates, key)
        for f in schema.fields:
            if f.name not in new.columns and f.name not in managed:
                new = new.withColumn(f.name, F.lit(None).cast(f.dataType))
        old = self._read(table, schema)

        from pyspark.sql import Observation

        obs = Observation(f"merge_{table}")
        result = merge_frames(old, new, key, cols, update_tag).observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
        )
        # Counters need the pre-merge join flags; compute created/updated
        # with a separate lightweight agg on keys only (cheap: key columns
        # prune to a 2-column scan on both sides).
        v = self._write(table, result, partition_col)
        rows = obs.get["rows"]
        created = new.join(old.select(*key), key, "left_anti").count()
        counters = {
            "rows_total": rows,
            "created": created,
            "updated": new.count() - created,
        }
        self._record_metrics(f"merge_{table}", update_tag, counters)
        return {**counters, "version": v}

    def merge_nodes(self, updates: DataFrame, update_tag: int) -> dict[str, int]:
        """Idempotent node upsert (U1). ``updates`` columns: label, id,
        [extra_labels, scope_id, props]."""
        return self._merge("nodes", NODES_SCHEMA, _NODE_KEY, updates, update_tag, "label")

    def merge_edges(self, updates: DataFrame, update_tag: int) -> dict[str, int]:
        """Idempotent edge upsert (U2), keyed (rel_label, src, dst)."""
        return self._merge("edges", EDGES_SCHEMA, _EDGE_KEY, updates, update_tag, "rel_label")

    # ---------- cleanup sweep (C1-C6) ----------

    def sweep(
        self,
        node_schema,
        update_tag: int,
        scope_id: str | None = None,
    ) -> dict[str, int]:
        """Watermark anti-join staleness sweep for one node schema.

        Implements the reference's 4-case cleanup matrix
        (``cleanupbuilder.py:16-77``) exactly:

        - no relationships at all -> no-op; such nodes are never
          auto-cleaned (``cleanupbuilder.py:24-30``, C6);
        - sub-resource + scoped_cleanup=False -> ValueError
          (``cleanupbuilder.py:42-48``);
        - sub-resource + scoped_cleanup=True -> scoped delete of stale
          nodes (DETACH: all their edges) + stale declared rels (C1/C2);
        - no sub-resource + scoped_cleanup=True -> rel-only cleanup, the
          nodes are preserved (``cleanupbuilder.py:50-62``, C4);
        - no sub-resource + scoped_cleanup=False -> unscoped full cleanup
          (C3).

        One distributed anti-join replaces the reference's LIMIT-100
        delete loop (``graph/job.py:163-173``) — no iteration needed.
        """
        label = node_schema.label
        rels = node_schema.all_relationships
        if not rels:
            return {"nodes_deleted": 0, "edges_deleted": 0}
        has_sub = node_schema.sub_resource_relationship is not None
        if has_sub and not node_schema.scoped_cleanup:
            raise ValueError(
                f"NodeSchema({label}): sub_resource_relationship with "
                "scoped_cleanup=False is an invalid combination"
            )
        if has_sub and scope_id is None:
            raise ValueError(f"NodeSchema({label}): scoped sweep requires scope_id")

        nodes = self.read_nodes()
        edges = self.read_edges()
        tag = int(update_tag)
        rel_labels = [r.rel_label for r in rels]

        stale_edge = (
            F.col("rel_label").isin(rel_labels)
            & ((F.col("src_label") == label) | (F.col("dst_label") == label))
            & (F.col("lastupdated") != tag)
        )
        if has_sub:
            stale_edge = stale_edge & (F.col("scope_id") == scope_id)

        delete_nodes = has_sub or not node_schema.scoped_cleanup
        if delete_nodes:
            stale_node = (F.col("label") == label) & (F.col("lastupdated") != tag)
            if has_sub:
                stale_node = stale_node & (F.col("scope_id") == scope_id)
            doomed_ids = nodes.where(stale_node).select(F.col("id").alias("__gone"))
            nodes_deleted = doomed_ids.count()
            new_nodes = nodes.where(~stale_node)
            # DETACH DELETE: drop every edge touching a deleted node.
            # Left-anti joins; at Iceberg scale this is a row-level
            # DELETE with a semi-join pushdown.
            new_edges = (
                edges.join(
                    doomed_ids,
                    (edges["src"] == F.col("__gone")) & (edges["src_label"] == label),
                    "left_anti",
                )
                .join(
                    doomed_ids,
                    (F.col("dst") == F.col("__gone")) & (F.col("dst_label") == label),
                    "left_anti",
                )
                .where(~stale_edge)
            )
        else:
            nodes_deleted = 0
            new_nodes = nodes
            new_edges = edges.where(~stale_edge)

        edges_deleted = edges.count() - new_edges.count()
        self._write("nodes", new_nodes, "label")
        self._write("edges", new_edges, "rel_label")
        counters = {"nodes_deleted": nodes_deleted, "edges_deleted": edges_deleted}
        self._record_metrics(f"sweep_{label}", update_tag, counters)
        return counters

    def sweep_matchlink(self, matchlink, update_tag: int, scope_id: str) -> dict[str, int]:
        """MatchLink cleanup (C5): delete stale rels of this label within
        the given sub-resource scope (``cleanupbuilder.py:340-383``)."""
        edges = self.read_edges()
        stale = (
            (F.col("rel_label") == matchlink.rel_label)
            & (F.col("scope_id") == scope_id)
            & (F.col("lastupdated") != int(update_tag))
        )
        new_edges = edges.where(~stale)
        deleted = edges.count() - new_edges.count()
        self._write("edges", new_edges, "rel_label")
        self._record_metrics(f"sweep_link_{matchlink.rel_label}", update_tag, {"edges_deleted": deleted})
        return {"edges_deleted": deleted}
