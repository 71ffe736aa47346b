"""Source-format adapter contract: explicit-schema requirement, unknown
format rejection, and exact row-level round-trip fidelity per format
(the registered q_source_* queries prove the aggregate path under the
driver gate; these prove raw rows)."""

from __future__ import annotations

import pytest

from fxa_amplitude_send_spark.sources import load_table, read_as, stage_roundtrip

SF = "/root/testdata/sf0.001"


def test_read_as_rejects_unknown_format(spark):
    with pytest.raises(ValueError, match="unknown format"):
        read_as(spark, "/tmp/nope", "avro")


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_text_formats_require_schema(spark, fmt):
    with pytest.raises(ValueError, match="explicit schema"):
        read_as(spark, "/tmp/nope", fmt)


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_roundtrip_rows_exact(spark, fmt):
    src = load_table(spark, SF, "customer")
    back = stage_roundtrip(spark, SF, "customer", fmt)
    assert back.schema == src.schema
    cols = sorted(src.columns)
    a = {tuple(r) for r in src.select(*cols).collect()}
    b = {tuple(r) for r in back.select(*cols).collect()}
    assert a == b
