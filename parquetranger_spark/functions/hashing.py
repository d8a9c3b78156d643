"""md5-mod-n bucketing, value-exact vs the reference HashPartitioner.

Reference: /root/reference/parquetranger/core.py:25-44 —
``int(md5(str(v)).hexdigest(), 16) % num_groups`` zero-padded to
``int(log10(num_groups)) + 1`` digits; bucket column named
``__pqr-hash-{col}-{n}__``; hashes the index when no column is given.
Exactness is pinned by tests/test_core.py:270-280 ("2" of 3, "166" of 300).

Spark-first: a 128-bit integer doesn't fit any Spark numeric type, but the
mod distributes over base-2^32 chunks of the md5 hex digest:

    int(h, 16) % n == fold(chunks c: acc = (acc*2^32 + c) % n)

Each 8-hex-digit chunk fits a long via ``conv(_, 16, 10)``; with acc < n
the fold stays within int64 for n < 2^31 (acc*2^32 + c <= (n-1)*2^32 +
2^32-1 < 2^63). All pure Column expressions → whole-stage codegen, no
Python in the hot path; usable directly as a ``partitionBy`` column at any
scale.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_MAX_GROUPS = 1 << 31


def hash_bucket_col_name(col: str | None, num_groups: int) -> str:
    # Reference name (core.py:31) uses "-" which is awkward in hive dir
    # names; keep the pqr prefix but underscore-sanitize.
    return f"__pqr_hash_{col or 'index'}_{num_groups}"


def md5_mod(col: Column | str, num_groups: int) -> Column:
    """``int(md5(str(v)), 16) % num_groups`` as a long Column."""
    if not (0 < num_groups < _MAX_GROUPS):
        raise ValueError(f"num_groups must be in (0, 2^31), got {num_groups}")
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(c.cast("string"))
    acc = F.lit(0).cast("long")
    shift = F.lit(1 << 32).cast("long")
    n = F.lit(num_groups).cast("long")
    for i in range(4):
        chunk = F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")
        acc = (acc * shift + chunk) % n
    return acc


def md5_prefix_long(col: Column | str) -> Column:
    """First 8 md5 hex digits of ``str(v)`` as a long in [0, 2³²) — the
    engine-wide deterministic uniform draw (oracle twin: DuckDB
    ``CAST(concat('0x', substr(md5(CAST(v AS VARCHAR)), 1, 8)) AS
    BIGINT)``). Centralized so sampling/splitting surfaces share ONE
    hash device — changing the prefix width in one place changes them
    all in lockstep."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")


def md5_bucket(col: Column | str, num_groups: int) -> Column:
    """Zero-padded string bucket id, byte-identical to the reference's
    directory names (core.py:36,43-44)."""
    width = int(math.log10(num_groups)) + 1
    return F.format_string(f"%0{width}d", md5_mod(col, num_groups))


class HashPartitioner:
    """Declarative stand-in for the reference HashPartitioner (core.py:25-44).

    Instead of computing a pandas Series on the driver, this contributes a
    computed partition column; ``TableRepo`` adds it before ``partitionBy``
    so the write shuffles by bucket exactly like any other partition column.
    """

    def __init__(self, col: str | None = None, num_groups: int = 128):
        self.col = col
        self.num_groups = num_groups

    @property
    def bucket_col(self) -> str:
        return hash_bucket_col_name(self.col, self.num_groups)

    def assign(self, df, index_cols: list[str] | None = None):
        """Return df with the bucket column appended.

        ``col=None`` hashes the (reified) index — the first index column
        (reference hashes the pandas index, core.py:39-41).
        """
        src = self.col
        if src is None:
            if not index_cols:
                raise ValueError("HashPartitioner without a column needs index_cols")
            src = index_cols[0]
        return df.withColumn(self.bucket_col, md5_bucket(src, self.num_groups))
