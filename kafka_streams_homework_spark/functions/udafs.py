"""Vectorized user-defined aggregates (SURVEY §2.7 U2 escape hatch).

The reference's UDAF surface (``aggregate()`` with an aggregator on the
KGroupedStream) maps to column expressions wherever the aggregate is
expressible (SURVEY §2.7); THIS module is the other half of the
contract — aggregates that genuinely need per-group numeric code run
as grouped-agg pandas UDFs: Arrow ships each group's column as one
numpy-backed Series, the Python body runs once per group (not per
row), and Spark's hash aggregate handles the grouping/shuffle exactly
as for a built-in.

Scale notes: a grouped-agg pandas UDF does NOT do partial aggregation
— each group's full value set crosses to Python, so it belongs on
bounded-cardinality groups (per-type, per-window), not per-corpus-key
groups. When the aggregate decomposes into partials (like geomean =
exp(sum(ln)/n)), prefer the pure-column form; geomean_column below is
that twin, and the registry query pins both to the same oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean_udaf(v: pd.Series) -> float:
    """Geometric mean over one group, vectorized (requires v > 0)."""
    return float(np.exp(np.log(v.to_numpy()).mean()))


def geomean_column(col: str | Column) -> Column:
    """The decomposable twin: exp(avg(ln(x))) as pure column algebra —
    partial-aggregation-friendly (each map task ships one (sum, n)
    pair), so it's the form to use on high-cardinality keys."""
    c = F.col(col) if isinstance(col, str) else col
    return F.exp(F.avg(F.log(c)))
