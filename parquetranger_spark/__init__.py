"""parquetranger_spark — a PySpark-native partitioned-parquet analytics engine.

Capability-parity rebuild of ``endremborza/parquetranger`` (storage layer:
partitioned append / keyed upsert / partition overwrite / pruned read /
schema evolution / per-partition map) plus the large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns,
event analytics) expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Pandas UDFs only where built-ins can't express the semantics.
"""

from .functions.hashing import HashPartitioner, md5_bucket, md5_mod, md5_prefix_long
from .session import get_spark
from .sources.bucketed import BucketedRepo
from .operators.ann_index import AnnIndex
from .sources.ingestor import ObjIngestor, shred_json_df
from .sources.sql_catalog import RepoCatalog
from .sources.matview import MaterializedAggView
from .sources.table_repo import TableRepo
from .sources.txn import Transaction, TransactionError
from .sources.writers import DfBatchWriter, FixedRecordWriter, RecordWriter

__version__ = "0.3.0"

# the reference exports TableRepo, HashPartitioner, RecordWriter,
# DfBatchWriter, ObjIngestor (/root/reference/parquetranger/__init__.py:3-4);
# BucketedRepo / shred_json_df are engine extensions (SURVEY §2.4)
__all__ = [
    "TableRepo",
    "Transaction",
    "MaterializedAggView",
    "TransactionError",
    "AnnIndex",
    "RepoCatalog",
    "BucketedRepo",
    "HashPartitioner",
    "RecordWriter",
    "FixedRecordWriter",
    "DfBatchWriter",
    "ObjIngestor",
    "shred_json_df",
    "md5_bucket",
    "md5_mod",
    "md5_prefix_long",
    "get_spark",
    "__version__",
]
