from pyspark.sql import functions as F

from rad_database_parse_spark.operators.header_map import (
    _partial_ratio,
    distributed_header_map,
    resolve_header_mapping,
)
from rad_database_parse_spark.operators.measures import parse_measure
from rad_database_parse_spark.operators.abbrev import (
    expand_abbreviations,
    extract_abbreviation_pairs,
)


def test_partial_ratio_basics():
    assert _partial_ratio("part number", "part number") == 100
    # substring containment scores 100 (partial semantics)
    assert _partial_ratio("manufacturer", "manufacturer name and details") == 100
    assert _partial_ratio("spec", "specification") == 100
    assert _partial_ratio("proton energy", "dose rate") < 60


def test_resolve_header_mapping_threshold_and_alias():
    headers = ["Part Number", "Mfr. Name", "Deg. Level", "Unrelated Col"]
    m = resolve_header_mapping(headers, threshold=75)
    assert m["part_number"] == 0
    assert m["degradation_level"] == 2  # via the 'deg level' alias (tables.py:182-183)
    assert "proton_fluence" not in m  # nothing scores ≥75


def test_resolve_header_mapping_monotone_threshold():
    headers = ["Part Number", "Manufactur", "Technolog"]
    low = resolve_header_mapping(headers, threshold=50)
    high = resolve_header_mapping(headers, threshold=95)
    assert set(high) <= set(low)  # raising the gate only removes mappings


def test_distributed_header_map(spark):
    headers = spark.createDataFrame(
        [(1, "Part Number"), (1, "Manufacturer"), (1, "zzz")], ["table_id", "header"]
    )
    out = distributed_header_map(headers, spark, threshold=60)
    got = {(r.canonical): r.matched_header for r in out.collect()}
    assert got["part_number"] == "Part Number"
    assert got["manufacturer"] == "Manufacturer"


def test_parse_measure_reference_shapes(spark):
    df = spark.createDataFrame(
        [("<1",), (">50",), ("HDR~65  LDR~30",), ("12.5",), ("garbage",)], ["m"]
    )
    out = parse_measure(df, "m").select("m", "m_parsed.*").collect()
    by_raw = {r.m: (r.op, r.value, r.qualifier) for r in out}
    assert by_raw["<1"] == ("<", 1.0, None)
    assert by_raw[">50"] == (">", 50.0, None)
    assert by_raw["HDR~65  LDR~30"] == ("~", 65.0, "HDR")
    assert by_raw["12.5"] == ("=", 12.5, None)
    assert by_raw["garbage"][1] is None


def test_abbrev_extract_parenthesized_newlines(spark):
    cell = "TID = Total Ionizing Dose\nSEE = Single Event Effect(s, see\nnote)\nLET = Linear Energy Transfer"
    df = spark.createDataFrame([(cell,)], ["cell"])
    pairs = {
        r.abbreviation: r.expansion
        for r in extract_abbreviation_pairs(df, "cell").collect()
    }
    assert pairs["TID"] == "Total Ionizing Dose"
    assert pairs["LET"] == "Linear Energy Transfer"
    # the parenthesized newline must NOT split the SEE record (main.py:26-35)
    assert "SEE" in pairs and pairs["SEE"].startswith("Single Event Effect(s, see")


def test_expand_abbreviations_whole_word(spark):
    d = spark.createDataFrame(
        [("TID", "Total Ionizing Dose")], ["abbreviation", "expansion"]
    )
    df = spark.createDataFrame([("TID rose; TIDINGS stay",)], ["t"])
    out = expand_abbreviations(df, "t", d).collect()[0].t
    assert out == "Total Ionizing Dose rose; TIDINGS stay"

def test_expand_abbreviations_rejects_oversized_dict(spark):
    import pytest

    d = spark.createDataFrame(
        [(f"A{i}", f"alpha {i}") for i in range(3)], ["abbreviation", "expansion"]
    )
    with pytest.raises(ValueError, match="exceeds 2 entries"):
        expand_abbreviations(
            spark.createDataFrame([("x",)], ["t"]), "t", d, max_dict_size=2
        )
