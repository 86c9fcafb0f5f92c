"""Drift-detect state workflow: persisted query-state snapshots,
two-way drift reports, and shortcut aliases.

Re-expression of ``cartography/driftdetect/`` (913 LoC):

- :class:`State` — ``model.py:7-32``: a named validation query, its
  ordered property list, and the sorted stringified results.
- :func:`get_query_state` — ``get_states.py:111-175``: run the query,
  stringify (list fields joined ``"|"`` after sorting), sort rows,
  write a timestamped state file into the query directory, update the
  ``most-recent`` shortcut.
- :func:`add_shortcut` — ``add_shortcut.py:40-77``: alias -> filename
  in ``shortcut.json``; an existing alias is replaced.
- :func:`perform_drift_detection` — ``detect_deviations.py:70-116``:
  validate the two states ran the same query, then set-diff both ways;
  fields containing ``|`` are split back to lists in the report.

The states here are intentionally driver-side report snapshots, exactly
like the reference's JSON files (they hold the RESULTS of a scoped
validation query, not a table). Whole-table drift at scale runs through
:mod:`cartography_spark.operators.drift` (version time-travel +
``exceptAll``) — this module is the operator-facing workflow on top:
validation queries are Spark SQL over the store's ``graph_nodes`` /
``graph_edges`` views.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

from cartography_spark.store.graphstore import GraphStore

SHORTCUT_FILE = "shortcut.json"
TEMPLATE_FILE = "template.json"


@dataclass
class State:
    name: str
    validation_query: str
    properties: list[str] = field(default_factory=list)
    results: list[list[str]] = field(default_factory=list)

    def as_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "validation_query": self.validation_query,
            "properties": self.properties,
            "results": self.results,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "State":
        missing = {"name", "validation_query", "properties", "results"} - set(d)
        if missing:
            raise ValueError(f"invalid state file: missing fields {sorted(missing)}")
        return cls(d["name"], d["validation_query"], list(d["properties"]), [list(r) for r in d["results"]])


def load_state(query_directory: str, name: str) -> State:
    """Load a state by filename or shortcut alias (aliases resolve via
    ``shortcut.json``, like ``detect_deviations.py:26-50``)."""
    shortcuts = load_shortcuts(query_directory)
    fname = shortcuts.get(name, name)
    with open(os.path.join(query_directory, fname)) as f:
        return State.from_dict(json.load(f))


def write_state(state: State, query_directory: str, filename: str) -> str:
    path = os.path.join(query_directory, filename)
    with open(path, "w") as f:
        json.dump(state.as_dict(), f, indent=2)
    return path


def load_shortcuts(query_directory: str) -> dict[str, str]:
    p = os.path.join(query_directory, SHORTCUT_FILE)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f).get("shortcuts", {})


def add_shortcut(query_directory: str, alias: str, filename: str) -> None:
    """Alias -> state filename; replaces an existing alias
    (``add_shortcut.py:40-77``)."""
    p = os.path.join(query_directory, SHORTCUT_FILE)
    data = {"name": os.path.basename(query_directory.rstrip("/")), "shortcuts": {}}
    if os.path.exists(p):
        with open(p) as f:
            data = json.load(f)
    data.setdefault("shortcuts", {})[alias] = filename
    with open(p, "w") as f:
        json.dump(data, f, indent=2)


def _stringify_row(row) -> list[str]:
    """Reference field encoding (``get_states.py:160-172``): list
    fields become the sorted elements joined with ``|``; everything
    else is ``str()``."""
    out = []
    for v in row:
        if isinstance(v, (list, tuple)):
            out.append("|".join(sorted(str(i) for i in v)))
        else:
            out.append(str(v))
    return out


def get_query_state(
    store: GraphStore,
    query_directory: str,
    filename: str | None = None,
) -> State:
    """Run the directory's template validation query (Spark SQL over
    the store's graph views) and persist the resulting state snapshot;
    the ``most-recent`` shortcut is pointed at it. Returns the state."""
    from cartography_spark.store.reads import create_graph_views

    with open(os.path.join(query_directory, TEMPLATE_FILE)) as f:
        state = State.from_dict(json.load(f))
    create_graph_views(store)
    df = store.spark.sql(state.validation_query)
    state.properties = list(df.columns)
    state.results = sorted(_stringify_row(r) for r in df.collect())
    fname = filename or f"{int(time.time())}.json"
    write_state(state, query_directory, fname)
    add_shortcut(query_directory, "most-recent", fname)
    return state


def compare_states(start: State, end: State) -> list[list[Any]]:
    """Rows in ``end`` missing from ``start``, with ``|``-joined list
    fields split back (``detect_deviations.py:92-116``)."""
    seen = {tuple(r) for r in start.results}
    out: list[list[Any]] = []
    for row in end.results:
        if tuple(row) in seen:
            continue
        drift: list[Any] = []
        for f in row:
            parts = f.split("|")
            drift.append(parts if len(parts) > 1 else f)
        out.append(drift)
    return out


def perform_drift_detection(
    start: State, end: State
) -> tuple[list[list[Any]], list[list[Any]]]:
    """(new_results, missing_results) between two snapshots of the SAME
    query — mismatched name/query/properties raise, as the reference
    validates (``detect_deviations.py:70-89``)."""
    if start.name != end.name:
        raise ValueError("State names do not match.")
    if start.validation_query != end.validation_query:
        raise ValueError("State queries do not match.")
    if start.properties != end.properties:
        raise ValueError("State properties do not match.")
    return compare_states(start, end), compare_states(end, start)
