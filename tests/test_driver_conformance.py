"""Registry-wide driver-harness conformance.

The round driver canonicalizes every registered query's result with
pandas (``sort_values`` over all columns, then value-hashing).  pandas
cannot factorize/sort cells holding Python lists, dicts, or raw bytes —
exactly how round 4's first `inverted_index` attestation died
(``TypeError: unhashable type: 'list'``).  This test builds every
registered query's DataFrame at sf0.001 (lazy — schema only, no
execution beyond what plan construction itself requires) and rejects any
output column whose Spark type pandas cannot sort: arrays, maps,
structs, and binary.  Library operators may keep rich types; the
REGISTERED projection must serialize them (e.g. ``array_join``).
"""

from pathlib import Path

import pytest
from pyspark.sql import types as T

from keras_ocr_spark.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

_FORBIDDEN = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


@pytest.mark.skipif(not Path(SF_DIR).exists(), reason="driver testdata absent")
def test_registered_outputs_are_pandas_sortable(spark):
    bad = {}
    for name, (fn, _sql) in QUERIES.items():
        df = fn(spark, SF_DIR)
        offending = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _FORBIDDEN)
        ]
        if offending:
            bad[name] = offending
    assert not bad, (
        "registered queries emit driver-unsortable column types "
        f"(serialize them in the registered projection): {bad}"
    )
