"""cartography_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the semantics of son-oz/cartography
(an asset-graph batch builder: Get -> Transform -> Load -> Cleanup,
see reference ``cartography/sync.py`` and
``docs/root/dev/writing-intel-modules.md:24-26``) as a distributed,
DataFrame/Catalyst-first web-scale KG build:

- declarative node/edge schemas that compile to DataFrame plans
  (reference analog: ``cartography/models/core/*``,
  ``cartography/graph/querybuilder.py``),
- idempotent MERGE upserts with create-only ``firstseen``
  (``querybuilder.py:450-459``),
- watermark anti-join staleness sweeps
  (``cartography/graph/cleanupbuilder.py``),
- vectorized Arrow-UDF text/triple extraction,
- MinHash-LSH blocked entity linking + connected-components
  canonicalization,
- training-data ops (dedup, similarity search, text analysis).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observed behavior.
"""

__version__ = "0.1.0"
