import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from consent_based_conversion_adjustments_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def tiled_fixture(spark):
    """The reference unit fixture: consent = 3 base rows ×10, noconsent = 3 ×5.

    reference: cocoa/testing_constants.py:20-39 (FIXTURES.md F1); id_column
    made unique per row (the reference's all-zero ids only work because it
    keys on the pandas index).
    """
    def tile(base_rows, times, id_start):
        rows = []
        i = id_start
        for _ in range(times):
            for r in base_rows:
                rows.append({**r, "id_column": i})
                i += 1
        return rows

    consent_base = [
        {"a": 1, "b": 2, "conversion_column": 3.0, "product_level": "1_1"},
        {"a": 0, "b": 5, "conversion_column": 6.0, "product_level": "2_2"},
        {"a": 1, "b": 8, "conversion_column": 9.0, "product_level": "1_1"},
    ]
    noconsent_base = [
        {"a": 4, "b": 5, "conversion_column": 6.0, "product_level": "1_1"},
        {"a": 7, "b": 8, "conversion_column": 9.0, "product_level": "2_2"},
        {"a": 10, "b": 11, "conversion_column": 12.0, "product_level": "1_1"},
    ]
    consent = spark.createDataFrame(tile(consent_base, 10, 0))
    noconsent = spark.createDataFrame(tile(noconsent_base, 5, 1000))
    return consent, noconsent
