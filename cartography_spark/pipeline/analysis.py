"""Post-sync analysis jobs: ordered, declarative DataFrame rewrites of
the graph store.

Re-expression of the reference's JSON analysis jobs
(``cartography/graph/job.py:238-253`` ``run_from_json``; statements
executed in order, e.g.
``cartography/data/jobs/analysis/aws_ec2_asset_exposure.json``): an
:class:`AnalysisJob` is an ordered list of named steps, each a function
``(nodes_df, edges_df, params) -> (nodes_df, edges_df)``; the job runs
the steps sequentially and commits ONE new store version at the end
(the reference commits per statement; one commit keeps the rewrite
atomic).

:func:`exposure_propagation` is the N1 demo: seed a boolean flag from a
predicate, propagate it K hops along chosen rel labels with a
list-append provenance column — the reference's internet-exposure
pattern (clear -> seed -> propagate with ``coalesce(list,[])+type``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

from cartography_spark.store.graphstore import GraphStore

StepFn = Callable[[DataFrame, DataFrame, Mapping[str, Any]], tuple[DataFrame, DataFrame]]


@dataclass
class AnalysisStep:
    name: str
    fn: StepFn


@dataclass
class AnalysisJob:
    name: str
    steps: list[AnalysisStep] = field(default_factory=list)

    def add_step(self, name: str, fn: StepFn) -> "AnalysisJob":
        self.steps.append(AnalysisStep(name, fn))
        return self

    def run(
        self, store: GraphStore, update_tag: int, params: Mapping[str, Any] | None = None
    ) -> dict[str, Any]:
        params = dict(params or {})
        nodes, edges = store.read_nodes(), store.read_edges()
        for step in self.steps:
            nodes, edges = step.fn(nodes, edges, params)
        store._write("nodes", nodes, "label")
        store._write("edges", edges, "rel_label")
        store._record_metrics(f"analysis_{self.name}", update_tag, {"steps": len(self.steps)})
        return {"job": self.name, "steps": [s.name for s in self.steps]}


def set_prop(nodes: DataFrame, label: str, prop: str, value: F.Column) -> DataFrame:
    """SET n.prop = value on nodes of one label (reference: the clear /
    tag statements, e.g. ``aws_foreign_accounts.json``)."""
    return nodes.withColumn(
        "props",
        F.when(
            F.col("label") == label,
            F.map_concat(
                F.coalesce(F.col("props"), F.expr("map()")),
                F.create_map(F.lit(prop), value.cast("string")),
            ),
        ).otherwise(F.col("props")),
    )


def exposure_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    seed_predicate: F.Column,
    rel_labels: Sequence[str],
    hops: int,
    flag: str = "exposed",
) -> DataFrame:
    """N1 semantics: clear ``flag``, seed it where ``seed_predicate``
    holds, then propagate ``hops`` times along ``rel_labels`` edges
    (dst inherits from src), appending the provenance path to
    ``<flag>_via``. Returns updated nodes."""
    cleared = nodes.withColumn(
        "props", F.map_filter(F.coalesce(F.col("props"), F.expr("map()")),
                              lambda k, _: (k != flag) & (k != f"{flag}_via"))
    )
    flagged = cleared.select(
        "label", "id", seed_predicate.alias("__flag"), F.when(seed_predicate, F.lit("seed")).alias("__via")
    )
    rel_edges = edges.where(F.col("rel_label").isin(list(rel_labels))).select("src", "dst", "rel_label")
    for _ in range(hops):
        inherited = (
            rel_edges.join(
                flagged.where(F.col("__flag")).select(F.col("id").alias("src"), F.col("__via")),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            # min over the COMBINED path expression so via and rel_label
            # always come from the same incoming edge (independent
            # min(via)/min(rel) could stitch a path no edge has).
            .agg(
                F.min(F.concat(F.col("__via"), F.lit("->"), F.col("rel_label"))).alias(
                    "__via_new"
                )
            )
        )
        flagged = (
            flagged.join(inherited, "id", "left")
            .select(
                "label", "id",
                (F.col("__flag") | F.col("__via_new").isNotNull()).alias("__flag"),
                F.coalesce(F.col("__via"), F.col("__via_new")).alias("__via"),
            )
        )
    return (
        cleared.join(flagged.where(F.col("__flag")).select("label", "id", "__via"), ["label", "id"], "left")
        .withColumn(
            "props",
            F.when(
                F.col("__via").isNotNull(),
                F.map_concat(
                    F.coalesce(F.col("props"), F.expr("map()")),
                    F.create_map(F.lit(flag), F.lit("true"), F.lit(f"{flag}_via"), F.col("__via")),
                ),
            ).otherwise(F.col("props")),
        )
        .drop("__via")
    )
