"""pandas_db_sdk_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
``Pandas-DB/pandas-db-sdk`` reference (see ``/root/reference``, surveyed in
``SURVEY.md``):

* the reference's storage model — named DataFrame datasets with Date/ID
  partition keys, ``external_key`` versioning, ``keep_last`` retention and
  prefix listing (reference ``client.py:66-215``, ``README.md:189-218``) —
  implemented as parquet + a JSON manifest catalog (:mod:`.engine`);
* the presupposed pandas query surface (projection/filter/join/agg/window/
  set-ops/scalar functions), executed distributed via the Spark DataFrame
  API (:mod:`.corpus` — the oracle-checked query inventory);
* streaming analogues over event tables (:mod:`.streaming`);
* LLM-data-pipeline operators: dedup (exact, MinHash-LSH, SimHash, n-gram
  Jaccard), vector similarity search, text analysis, multimodal columns
  (:mod:`.dedup`, :mod:`.similarity`, :mod:`.text`, :mod:`.multimodal`).

Everything is declarative DataFrame code: Catalyst handles pushdown,
pruning, join strategy and AQE; no RDDs, no driver-side collects in any
operator path, so every operator scales from ``local[*]`` to a large
cluster unchanged.
"""

from .session import get_spark
from .engine import DataFrameEngine, DataQualityError, DatasetNotFound
from .client import DataFrameClient

__all__ = ["get_spark", "DataFrameEngine", "DataFrameClient", "DataQualityError", "DatasetNotFound", "__version__"]
__version__ = "0.1.0"
