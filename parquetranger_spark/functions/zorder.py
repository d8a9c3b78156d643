"""Z-order (Morton) clustering expressions for multi-dimensional scan
skipping.

Single-key clustering (``TableRepo(cluster_by=...)``, lexicographic sort)
tightens parquet row-group min/max stats on the FIRST key only; a filter
on the second key still scans everything. Interleaving the keys' bits
makes every file cover a compact hyper-rectangle, so filters on ANY
clustered dimension skip most files — the standard layout trick (Morton
curves) behind Delta/Iceberg's OPTIMIZE ZORDER, built here from pure
Column bit arithmetic (shift/and/or inside whole-stage codegen; no UDF,
no shuffle beyond the write's own).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scale_to_bits(col: Column, cmin: float, cmax: float, bits: int = 16) -> Column:
    """Affinely map a numeric column from [cmin, cmax] onto the integer
    grid [0, 2^bits) — the rank substitute Z-ordering needs. Bounds come
    from the caller (one tiny min/max aggregate over the write batch, or
    static domain knowledge); out-of-range values clamp."""
    span = float(cmax) - float(cmin)
    if span <= 0:
        return F.lit(0).cast("long")
    maxv = (1 << bits) - 1
    # NULLs map to cmin BEFORE the clamp (matching a lexicographic sort's
    # nulls-first): least/greatest SKIP nulls, so a null reaching the
    # clamp would ride up to the max cell and co-locate with genuine
    # max-value rows, widening those files' stats
    safe = F.coalesce(col.cast("double"), F.lit(float(cmin)))
    scaled = F.floor((safe - F.lit(float(cmin))) / F.lit(span) * F.lit(maxv))
    return F.greatest(F.lit(0), F.least(F.lit(maxv), scaled)).cast("long")


def zorder_value(scaled_cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each pre-scaled column
    into one sortable long. With n columns the result uses n·bits bits
    (keep ≤ 63). Pure bit arithmetic — expands to a flat tree of
    shift/and/or expressions that codegen folds into straight-line JVM
    code."""
    n = len(scaled_cols)
    if n * bits > 63:
        # not an assert: under python -O it would vanish and bit
        # positions past 63 silently wrap into the sign bit, clustering
        # files on garbage keys with no error
        raise ValueError(
            f"zorder: {n} cols x {bits} bits = {n * bits} exceeds a signed long (63)"
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(scaled_cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            pos = b * n + (n - 1 - i)
            z = z.bitwiseOR(F.shiftleft(bit, pos))
    return z


from ..serde import pickle_module_by_value as _pmv  # noqa: E402

_pmv(__name__)
