"""Salted join — the explicit skew-join technique, next to the salted
AGGREGATION in ``operators/convstats.py`` and AQE's automatic skew
split (``tests/test_aqe_skew.py``).

When one join key holds a disproportionate share of the fact side
(the 700-turn conversation; the bot user with 10^8 events), a plain
hash join lands that key's every row in ONE reducer. AQE splits such
partitions automatically when statistics surface them; the MANUAL
form below is the guaranteed fix a pipeline reaches for when it
already knows its hot keys (or can't rely on runtime stats — e.g.,
stream-static joins, or skew inside a single key that AQE cannot
split across its join):

    fact:  salt = pmod(hash(noise), n_salt)        (row spread)
    dim:   replicated once per salt value (explode)  (n_salt copies)
    join on (key, salt)                              (hot key now in
                                                      n_salt reducers)

Cost: the dim side shuffles n_salt-fold (choose n_salt ~ the skew
factor, not more); result rows are identical to the unsalted join —
asserted against it in tests and by the driver oracle.

Reference analog: the batch-assembly padding split
(``/root/reference/keras_ocr/recognition.py:504-526``) — spreading
one oversized work item across uniform units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """``fact ⋈ dim`` on ``key`` with the fact side salted and the dim
    side replicated ``n_salt`` times. Result equals the plain join
    (same rows, modulo column order); only the physical distribution
    differs. ``dim`` columns must not collide with fact columns other
    than ``key``."""
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    f_salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salt)).cast("int")
    )
    d_repl = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = f_salted.join(d_repl, [key, "_salt"], how)
    return out.drop("_salt")
