"""Arrow-vectorized pandas UDF definitions (the fast Python-UDF paths).

Deliberately NO ``from __future__ import annotations`` in this module:
``pandas_udf`` resolves the REAL type hints at definition time to pick the
UDF kind (Series→Series = scalar, Series→scalar = grouped aggregate);
postponed-evaluation string annotations would break that.

Arithmetic convention (registry float-parity policy): money enters as
2-decimal-clean doubles, is converted to exact int64 cents inside the UDF,
accumulated in integer space, and only the final ratio runs in double —
hash-identical to a DECIMAL-based SQL oracle.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("bigint")
def net_price_c4(ep: pd.Series, disc: pd.Series) -> pd.Series:
    """Scalar UDF: extendedprice×(1−discount) in 10^-4-dollar int units."""
    ep_c = (ep * 100).round().astype("int64")
    d_pct = (disc * 100).round().astype("int64")
    return ep_c * (100 - d_pct)


@pandas_udf("double")
def weighted_avg_price(ep: pd.Series, qty: pd.Series) -> float:
    """Grouped-aggregate UDF (UDAF): quantity-weighted mean price, exact
    int64 accumulation, one double division."""
    ep_c = (ep * 100).round().astype("int64")
    q = qty.round().astype("int64")
    return float((ep_c * q).sum()) / (100.0 * float(q.sum()))

