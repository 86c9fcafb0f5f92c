"""Sync orchestration: Get -> Transform -> Load -> Cleanup.

Re-expression of the reference's sync lifecycle:

- :func:`load` is the hot path — the analog of
  ``cartography/client/core/tx.py:283-303`` (``load``): empty-input
  short-circuit (``tx.py:298-300``), schema-compiled node upsert, then one
  edge upsert per declared relationship. Batching (``tx.py:231``: 10k dicts
  per transaction) becomes partition-parallel writes; one store version per
  load is the transaction analog.
- :class:`Sync` is the analog of ``cartography/sync.py:126-156``: named
  stages run sequentially in declared order, each stamped with the run's
  ``update_tag`` (epoch seconds, ``sync.py:280-282``); a stage ledger makes
  the run **resumable** — a rerun with the same update_tag skips stages that
  already committed (per-stage lineage via the store's version pointer +
  metrics rows).

Scale: the per-tenant Python loop of the reference
(``intel/aws/__init__.py:173-248``) is replaced by the ``scope_id`` column —
all tenants flow through one partitioned plan.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Mapping, Sequence

from functools import reduce

from pyspark.sql import DataFrame

from cartography_spark.schema.compiler import (
    compile_edge_updates,
    compile_matchlink,
    compile_node_updates,
)
from cartography_spark.schema.nodes import NodeSchema
from cartography_spark.schema.relationships import MatchLinkSchema, RelSchema
from cartography_spark.store.graphstore import GraphStore


def load(
    store: GraphStore,
    schema: NodeSchema,
    df: DataFrame,
    update_tag: int,
    selected_rels: Sequence[RelSchema] | None = None,
    **params: Any,
) -> dict[str, int]:
    """Schema-driven ingest of one DataFrame of items."""
    if df.isEmpty():  # reference short-circuit tx.py:298-300
        return {"created": 0, "updated": 0, "edges": 0}
    df = df.cache()  # consumed by the node plan + every edge plan
    node_updates = compile_node_updates(schema, df, params)
    node_counters = store.merge_nodes(node_updates, update_tag)
    edge_counters: dict[str, int] = {}
    plans = compile_edge_updates(schema, df, store.read_nodes(), params, selected_rels)
    if plans:
        # Independent per-rel joins unioned into ONE edge merge: keeps the
        # reference's CALL{} isolation semantics while paying a single
        # decomposed MERGE (broadcast-able LEFT OUTER update pass + key-only
        # ANTI create pass, bucket-scoped read/rewrite) against the edge
        # table instead of one merge per rel plan.
        all_edges = reduce(lambda a, b: a.unionByName(b), plans)
        edge_counters = store.merge_edges(all_edges, update_tag)
    df.unpersist()
    return {
        "created": node_counters["created"],
        "updated": node_counters["updated"],
        "edges": edge_counters.get("created", 0) + edge_counters.get("updated", 0),
    }


def load_matchlink(
    store: GraphStore,
    link: MatchLinkSchema,
    df: DataFrame,
    update_tag: int,
    scope_id: str,
    **params: Any,
) -> dict[str, int]:
    """Standalone rel ingest between two existing node sets (J7)."""
    if df.isEmpty():
        return {"edges": 0}
    edges = compile_matchlink(link, df, store.read_nodes(), params, scope_id=scope_id)
    c = store.merge_edges(edges, update_tag)
    return {"edges": c["created"] + c["updated"]}


@dataclass
class Stage:
    name: str
    fn: Callable[..., Any]  # fn(store, update_tag, **params)


@dataclass
class Sync:
    store: GraphStore
    stages: list[Stage] = field(default_factory=list)

    def add_stage(self, name: str, fn: Callable[..., Any]) -> None:
        self.stages.append(Stage(name, fn))

    def _ledger_path(self) -> str:
        return os.path.join(self.store.root, "SYNC_LEDGER.json")

    def _ledger(self) -> dict:
        p = self._ledger_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def _mark_done(self, update_tag: int, name: str) -> None:
        led = self._ledger()
        led.setdefault(str(update_tag), []).append(name)
        tmp = self._ledger_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(led, f)
        os.replace(tmp, self._ledger_path())

    def run(
        self,
        update_tag: int | None = None,
        params: Mapping[str, Any] | None = None,
        resume: bool = True,
        best_effort: bool = False,
    ) -> dict[str, Any]:
        """Run stages in declared order (reference: OrderedDict stage order,
        ``sync.py:54-88``; any stage exception aborts, ``sync.py:148-153`` —
        ``best_effort=True`` instead aggregates per-stage errors like the
        reference's multi-account loop, ``intel/aws/__init__.py:222-238``)."""
        if update_tag is None:
            update_tag = int(time.time())
        done = set(self._ledger().get(str(update_tag), [])) if resume else set()
        results: dict[str, Any] = {"update_tag": update_tag, "stages": {}}
        errors: dict[str, str] = {}
        for stage in self.stages:
            if stage.name in done:
                results["stages"][stage.name] = "skipped(resume)"
                continue
            try:
                out = stage.fn(self.store, update_tag, **(dict(params) if params else {}))
                results["stages"][stage.name] = out
                self._mark_done(update_tag, stage.name)
            except Exception as e:  # noqa: BLE001
                if not best_effort:
                    raise
                errors[stage.name] = repr(e)
        if errors:
            results["errors"] = errors
        return results
