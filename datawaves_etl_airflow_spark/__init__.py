"""datawaves_etl_airflow_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, every computation the reference
(datawaves-xyz/datawaves-etl-airflow) delegates to an external SQL-runner
jar and external etl CLI packages: schema-on-read staging scans, the
enrich join/projection family, partitioned idempotent sinks, data-quality
verification, and ABI-driven event/call decoding — plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal column plumbing) a 100 TB pipeline needs.

Design stance (SURVEY.md §7): DataFrame/SQL declarative plans, explicit
StructType schemas, Catalyst does the optimizing; pandas UDFs only where
builtins genuinely cannot express the semantics (ABI decode, multimodal).
"""

__version__ = "0.2.0"

from .chains import CHAINS, ETHEREUM, POLYGON  # noqa: E402,F401
from .session import get_spark  # noqa: E402,F401
