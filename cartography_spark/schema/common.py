"""PropertyRef — binding layer between input rows and graph properties.

Re-expression of the reference's ``cartography/models/core/common.py:1-109``:
a property value comes either from the input row (``F.col(name)``) or from a
run-level keyword parameter bound at plan-build time (``F.lit(params[name])``,
the reference's ``set_in_kwargs=True`` / ``$param`` form,
``common.py:94-109``).

Match-time modifiers mirror the reference exactly:
- ``ignore_case``     -> join on ``lower(col)``            (``common.py:33-43``)
- ``fuzzy_and_ignore_case`` -> substring containment join  (``common.py:44-47``)
- ``one_to_many``     -> the row field is a *list* of target ids; the plan
  explodes it and equi-joins (``common.py:48-66``)
- ``extra_index``     -> the property is PROMOTED to a typed top-level
  ``_p_<name>`` column in the node table (store schema evolution); matcher
  joins read it instead of ``element_at(props, name)``, recovering the
  stats-pruned lookups the reference gets from auto-created indexes
  (``common.py:26-32``; ``querybuilder.py:490-551``)
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Mapping

from pyspark.sql import Column, functions as F

#: DDL primitives a promoted column may declare (validated at
#: declaration so a typo fails with a clear error, not a ParseException
#: deep inside a merge after a version was already allocated).
_INDEX_TYPE_RX = re.compile(
    r"string|boolean|tinyint|smallint|int|integer|bigint|long|float|real"
    r"|double|date|timestamp|timestamp_ntz|binary|decimal\(\d+,\s*\d+\)"
)


@dataclass(frozen=True)
class PropertyRef:
    name: str
    set_in_kwargs: bool = False
    ignore_case: bool = False
    fuzzy_and_ignore_case: bool = False
    one_to_many: bool = False
    extra_index: bool = False
    #: Spark DDL type of the promoted ``_p_<name>`` column (e.g.
    #: ``"bigint"``, ``"double"``, ``"timestamp"``). Only meaningful
    #: with ``extra_index=True``; default string. A typed promotion
    #: gives the column REAL min/max ordering in parquet row-group
    #: stats — a numeric range filter on a string-typed copy prunes by
    #: lexicographic order, i.e. not at all. The type is fixed at first
    #: declaration (store schema evolution never retypes a column).
    index_type: str | None = None

    def __post_init__(self) -> None:
        # Mirror the reference's invalid-combination guards
        # (models/core/common.py:68-92).
        if self.one_to_many and self.set_in_kwargs:
            raise ValueError("one_to_many cannot be set_in_kwargs")
        if self.fuzzy_and_ignore_case and self.one_to_many:
            raise ValueError("fuzzy_and_ignore_case cannot combine with one_to_many")
        if self.index_type is not None and not self.extra_index:
            raise ValueError("index_type requires extra_index=True")
        if (
            self.index_type is not None
            and self.index_type != "string"
            and (self.ignore_case or self.fuzzy_and_ignore_case)
        ):
            raise ValueError(
                "case-insensitive matchers require a string-typed promotion "
                f"(index_type={self.index_type!r} would put lower() on a "
                "non-string column)"
            )
        if self.index_type is not None and not _INDEX_TYPE_RX.fullmatch(
            self.index_type.strip().lower()
        ):
            # fail at declaration, not as a ParseException mid-merge
            raise ValueError(
                f"index_type {self.index_type!r} is not a supported Spark "
                "DDL primitive (string|boolean|tinyint|smallint|int|integer|"
                "bigint|long|float|real|double|date|timestamp|timestamp_ntz|"
                "binary|decimal(p,s))"
            )

    def to_column(self, params: Mapping[str, Any] | None = None) -> Column:
        """Resolve to a Column: input field, or run-param literal."""
        if self.set_in_kwargs:
            if params is None or self.name not in params:
                raise KeyError(
                    f"PropertyRef({self.name!r}) is set_in_kwargs but no "
                    f"run parameter {self.name!r} was supplied"
                )
            return F.lit(params[self.name])
        return F.col(self.name)
