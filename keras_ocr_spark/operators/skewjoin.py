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

    fact:  salt = row-position % n_salt              (row spread —
           position-based, so even fully IDENTICAL duplicate rows of
           the hot key spread across salts; a value-hash salt would
           send them all to one reducer, silently un-mitigating the
           exact scenario above)
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
    than ``key``.

    ``how`` is restricted to the fact-preserving joins: any join that
    preserves UNMATCHED dim rows ('right', 'full') would return each
    of them ``n_salt`` times (one per unmatched replica) and is
    rejected.
    """
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(f"how={how!r} would duplicate unmatched dim replicas; use one of {sorted(allowed)}")
    f_salted = fact.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int")
    )
    d_repl = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = f_salted.join(d_repl, [key, "_salt"], how)
    return out.drop("_salt")
